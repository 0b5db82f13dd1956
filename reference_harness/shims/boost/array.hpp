// Minimal boost::array stand-in backed by std::array.
#ifndef BOOST_ARRAY_SHIM_HPP
#define BOOST_ARRAY_SHIM_HPP

#include <array>

namespace boost {
template <typename T, std::size_t N>
using array = std::array<T, N>;
}

#endif
