// Placeholder for boost/format.hpp — included by the reference sources but
// boost::format is never instantiated there (verified by grep), so an empty
// header suffices.
#ifndef BOOST_FORMAT_SHIM_HPP
#define BOOST_FORMAT_SHIM_HPP
#endif
