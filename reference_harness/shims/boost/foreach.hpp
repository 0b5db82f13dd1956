// Minimal BOOST_FOREACH stand-in using a C++11 range-for.
#ifndef BOOST_FOREACH_SHIM_HPP
#define BOOST_FOREACH_SHIM_HPP

#define BOOST_FOREACH(decl, container) for (decl : container)

#endif
