// Minimal BOOST_STATIC_ASSERT stand-in.
#ifndef BOOST_STATIC_ASSERT_SHIM_HPP
#define BOOST_STATIC_ASSERT_SHIM_HPP
#define BOOST_STATIC_ASSERT(x) static_assert(x, #x)
#endif
