// iostream insertion/extraction for mpz_t, normally shipped with GMP's C++
// support (libgmpxx). The image only has the C runtime, so we provide the
// two operators here on top of the C API.
#include "gmp.h"

#include <cctype>
#include <cstdlib>
#include <istream>
#include <ostream>
#include <string>

std::ostream &operator<<(std::ostream &os, mpz_srcptr z) {
  char *s = mpz_get_str(nullptr, 10, z);
  os << s;
  std::free(s);
  return os;
}

std::istream &operator>>(std::istream &is, mpz_ptr z) {
  std::string s;
  is >> s;
  if (mpz_set_str(z, s.c_str(), 10) != 0) {
    is.setstate(std::ios::failbit);
  }
  return is;
}
