// Minimal spdlog shim so the reference headers compile without the real
// spdlog (not in this image; no network egress). The reference only uses
// spdlog through its LOG_* macros (reference include/utils/log.hpp:56-97);
// log output is irrelevant to the benchmark, so every level is a no-op.
#pragma once
#include "fmt/fmt.h"

namespace spdlog {
template <class... A> inline void trace(A &&...) {}
template <class... A> inline void debug(A &&...) {}
template <class... A> inline void info(A &&...) {}
template <class... A> inline void warn(A &&...) {}
template <class... A> inline void error(A &&...) {}
template <class... A> inline void critical(A &&...) {}
}  // namespace spdlog
