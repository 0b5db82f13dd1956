// Minimal boost::optional stand-in (the image has no boost headers).
// Backed by std::optional; covers the surface the reference uses:
// construction, assignment, boost::none, operator*, operator->, bool tests.
#ifndef BOOST_OPTIONAL_SHIM_HPP
#define BOOST_OPTIONAL_SHIM_HPP

#include <optional>

namespace boost {

struct none_t {
  constexpr explicit none_t(int) {}
};
inline constexpr none_t none{0};

template <typename T>
class optional {
 public:
  optional() = default;
  optional(none_t) {}
  optional(const T &v) : v_(v) {}
  optional(T &&v) : v_(std::move(v)) {}
  optional(const optional &) = default;
  optional(optional &&) = default;
  optional &operator=(const optional &) = default;
  optional &operator=(optional &&) = default;
  optional &operator=(none_t) {
    v_.reset();
    return *this;
  }
  optional &operator=(const T &v) {
    v_ = v;
    return *this;
  }

  explicit operator bool() const { return v_.has_value(); }
  bool operator!() const { return !v_.has_value(); }
  T &operator*() { return *v_; }
  const T &operator*() const { return *v_; }
  T *operator->() { return &*v_; }
  const T *operator->() const { return &*v_; }
  T &get() { return *v_; }
  const T &get() const { return *v_; }
  T value() const { return *v_; }
  bool has_value() const { return v_.has_value(); }
  void reset() { v_.reset(); }

 private:
  std::optional<T> v_;
};

}  // namespace boost

#endif
