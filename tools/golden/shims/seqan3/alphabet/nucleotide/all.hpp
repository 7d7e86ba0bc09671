// Shim for <seqan3/alphabet/nucleotide/all.hpp> (seqan3 is fetched at the
// reference's build time; not in-tree).  The reference's syncmer scanner
// (src/hashing/syncmer.cpp:97-99) only needs seqan3::dna5_vector with
// element .to_char(); seqan3::dna5 maps any character that is not
// A/C/G/T (case-insensitive) to 'N' and to_char() returns the uppercase
// rank character — reproduced here so char-level semantics match the
// real pipeline's char -> dna5 -> to_char round trip.
#pragma once

#include <cctype>
#include <string>
#include <vector>

namespace seqan3 {

struct dna5 {
    char rank_char = 'N';

    dna5() = default;
    explicit dna5(char c) { assign_char(c); }

    dna5& assign_char(char c) {
        switch (c) {
            case 'A': case 'a': rank_char = 'A'; break;
            case 'C': case 'c': rank_char = 'C'; break;
            case 'G': case 'g': rank_char = 'G'; break;
            case 'T': case 't': rank_char = 'T'; break;
            default: rank_char = 'N'; break;
        }
        return *this;
    }

    char to_char() const { return rank_char; }
};

using dna5_vector = std::vector<dna5>;

inline dna5_vector to_dna5(const std::string& s) {
    dna5_vector v;
    v.reserve(s.size());
    for (char c : s) v.push_back(dna5(c));
    return v;
}

}  // namespace seqan3
