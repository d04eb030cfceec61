// fmt shim: the reference's LOG_* macros wrap format strings in
// ::fmt::runtime(...) before handing them to (stubbed, no-op) spdlog.
#pragma once

namespace fmt {
template <class T> constexpr decltype(auto) runtime(T &&s) {
  return static_cast<T &&>(s);
}
}  // namespace fmt
