// libcoro shim: a minimal-but-complete coro::task so the reference's
// GraphSearchJob (which defines coroutine members returning coro::task<>)
// compiles without libcoro. The benchmark only calls the synchronous
// search_solo path, so the coroutine bodies are never instantiated — the
// type just has to be complete at the declaration sites.
#pragma once
#include <coroutine>
#include <exception>

namespace coro {

template <class T = void>
struct task {
  struct promise_type {
    task get_return_object() noexcept {
      return task{std::coroutine_handle<promise_type>::from_promise(*this)};
    }
    std::suspend_always initial_suspend() noexcept { return {}; }
    std::suspend_always final_suspend() noexcept { return {}; }
    void return_void() noexcept {}
    void unhandled_exception() { std::terminate(); }
  };
  std::coroutine_handle<promise_type> handle_{};
};

}  // namespace coro
