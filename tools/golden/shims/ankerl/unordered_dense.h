// Shim for <ankerl/unordered_dense.h> (the reference fetches ankerl
// unordered_dense v3.0.1 at build time; it is not in-tree).  Provides the
// two symbols the reference's hashing layer uses:
//
//   - ankerl::unordered_dense::set<T>          (src/hashing/syncmer.hpp:22)
//   - ankerl::unordered_dense::detail::wyhash::hash(uint64_t)
//                                              (src/hashing/syncmer.cpp:75)
//
// The set is aliased to std::unordered_set (only insert/iteration are used;
// fixture dumps are sorted, so iteration order is irrelevant).  The wyhash
// single-word hash is the canonical upstream definition from ankerl
// unordered_dense v3.0.1 (mix of the key with the golden-ratio constant,
// folding the 128-bit product): hash(x) = lo(x*C) ^ hi(x*C).
#pragma once

#include <cstdint>
#include <unordered_set>

namespace ankerl::unordered_dense {

template <class T>
using set = std::unordered_set<T>;

namespace detail::wyhash {

inline uint64_t mix(uint64_t a, uint64_t b) {
    unsigned __int128 r = a;
    r *= b;
    return static_cast<uint64_t>(r) ^ static_cast<uint64_t>(r >> 64);
}

inline uint64_t hash(uint64_t x) {
    return mix(x, UINT64_C(0x9E3779B97F4A7C15));
}

}  // namespace detail::wyhash

}  // namespace ankerl::unordered_dense
