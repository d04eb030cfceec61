// RaBitQSpace shim: the real header needs Eigen (absent from this image).
// GraphSearchJob references only RaBitQSpace<>::kDegreeBound and the
// is_rabitq_space_v trait outside of lazily-instantiated rabitq-only member
// bodies (reference include/executor/jobs/graph_search_job.hpp:66,94,161),
// so this declaration suffices to benchmark Raw/SQ spaces.
#pragma once
#include <cstddef>
#include <cstdint>
#include <type_traits>

namespace alaya {

template <typename DataType = float, typename DistanceType = float,
          typename IDType = uint32_t>
class RaBitQSpace {
 public:
  constexpr static size_t kDegreeBound = 32;
};

template <typename T> struct is_rabitq_space : std::false_type {};
template <typename T, typename U, typename V>
struct is_rabitq_space<RaBitQSpace<T, U, V>> : std::true_type {};
template <typename T>
inline constexpr bool is_rabitq_space_v = is_rabitq_space<T>::value;

}  // namespace alaya
