// Golden-fixture generator.
//
// Compiles the reference's in-tree, STL-only sources DIRECTLY FROM
// /root/reference (nothing is copied into this repository) against two
// minimal shim headers (tools/golden/shims/) standing in for the
// build-time-fetched ankerl and seqan3 headers, then dumps machine-checkable
// fixtures consumed by tests/test_golden.py:
//
//   syncmer.json    — reference syncmer hash sets per (seq, k, s, t)
//                     (src/hashing/syncmer.cpp:80-166)
//   xorfilter.json  — reference-built XOR-filter fingerprint tables with
//                     membership vectors for present + absent keys
//                     (src/main/xorfilter.hpp:142-349)
//   thresholds.json — reference threshold-model values on a parameter grid
//                     (src/hixf/search/{kmer_model,fracminhash_model,
//                     gaussian_inverse}.cpp, syncmer_model.hpp; the get()
//                     combination expressions mirror
//                     src/hixf/search/threshold.hpp:51-81)
//
// Build (see tools/golden/generate.py):
//   g++ -O2 -std=c++20 -I tools/golden/shims \
//       -I /root/reference/src/hashing -I /root/reference/src/main \
//       -I /root/reference/src/hixf/search tools/golden/gen_golden.cpp \
//       -o gen_golden
//   ./gen_golden <output-dir>

#include <unistd.h>

#include <algorithm>
#include <cinttypes>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <set>
#include <string>
#include <vector>

// ---- reference sources, included in place --------------------------------
#include "syncmer.cpp"    // /root/reference/src/hashing/syncmer.cpp
#include "xorfilter.hpp"  // /root/reference/src/main/xorfilter.hpp

#include "gaussian_inverse.cpp"   // /root/reference/src/hixf/search/
#include "kmer_model.cpp"         // /root/reference/src/hixf/search/
#include "fracminhash_model.cpp"  // /root/reference/src/hixf/search/
#include "syncmer_model.hpp"      // /root/reference/src/hixf/search/

// ---- deterministic RNG (splitmix64) --------------------------------------
static uint64_t sm_state;
static uint64_t splitmix64() {
    uint64_t z = (sm_state += UINT64_C(0x9E3779B97F4A7C15));
    z = (z ^ (z >> 30)) * UINT64_C(0xBF58476D1CE4E5B9);
    z = (z ^ (z >> 27)) * UINT64_C(0x94D049BB133111EB);
    return z ^ (z >> 31);
}

static std::string random_seq(size_t len, double n_prob_per_1000) {
    static const char* bases = "ACGT";
    std::string s;
    s.reserve(len);
    for (size_t i = 0; i < len; i++) {
        uint64_t r = splitmix64();
        if ((double)(r >> 32) < n_prob_per_1000 / 1000.0 * 4294967296.0) {
            s.push_back('N');
        } else {
            s.push_back(bases[r & 3]);
        }
    }
    return s;
}

// ---- tiny JSON emitter ----------------------------------------------------
struct Json {
    FILE* f;
    bool first = true;
    explicit Json(const char* path) { f = fopen(path, "w"); }
    ~Json() { fclose(f); }
    void raw(const char* s) { fputs(s, f); }
    void sep() {
        if (!first) fputs(",\n", f);
        first = false;
    }
};

static void emit_u64_array(FILE* f, const std::vector<uint64_t>& v) {
    fputs("[", f);
    for (size_t i = 0; i < v.size(); i++)
        fprintf(f, "%s%" PRIu64, i ? "," : "", v[i]);
    fputs("]", f);
}

// ---- fixture 1: syncmer hash sets -----------------------------------------
static void syncmer_case(Json& j, const char* name, const std::string& seq,
                         int k, int s, int t) {
    auto dna = seqan3::to_dna5(seq);
    auto hashes = hashing::seq_to_syncmers(k, dna, s, t);
    std::vector<uint64_t> sorted(hashes.begin(), hashes.end());
    std::sort(sorted.begin(), sorted.end());
    j.sep();
    fprintf(j.f, "{\"name\":\"%s\",\"k\":%d,\"s\":%d,\"t\":%d,\"seq\":\"%s\",\"hashes\":",
            name, k, s, t, seq.c_str());
    emit_u64_array(j.f, sorted);
    fputs("}", j.f);
}

static void gen_syncmer(const std::string& dir) {
    Json j((dir + "/syncmer.json").c_str());
    j.raw("[\n");
    // t = (k - s + 1) / 2 integer division, as computed by the reference
    // build app (src/main/taxor_build.cpp:370,510).
    struct KS { int k, s; };
    const KS schemes[] = {{22, 12}, {20, 10}, {16, 8}, {30, 18}, {12, 6}};
    for (auto [k, s] : schemes) {
        int t = (k - s + 1) / 2;
        char nm[64];
        sm_state = 0xC0FFEE ^ (uint64_t)(k * 131 + s);
        snprintf(nm, sizeof nm, "rand2k_k%d_s%d", k, s);
        syncmer_case(j, nm, random_seq(2000, 0), k, s, t);
        snprintf(nm, sizeof nm, "randN_k%d_s%d", k, s);
        syncmer_case(j, nm, random_seq(1500, 20), k, s, t);  // ~2% N
    }
    int k = 22, s = 12, t = (k - s + 1) / 2;
    sm_state = 0xABCDEF;
    syncmer_case(j, "empty", "", k, s, t);
    syncmer_case(j, "short_lt_s", random_seq(8, 0), k, s, t);
    syncmer_case(j, "len_s", random_seq(12, 0), k, s, t);
    syncmer_case(j, "len_km1", random_seq(21, 0), k, s, t);
    syncmer_case(j, "len_k", random_seq(22, 0), k, s, t);
    syncmer_case(j, "all_n", std::string(100, 'N'), k, s, t);
    syncmer_case(j, "lead_trail_n",
                 std::string(30, 'N') + random_seq(300, 0) + std::string(30, 'N'),
                 k, s, t);
    syncmer_case(j, "n_run_middle",
                 random_seq(200, 0) + std::string(40, 'N') + random_seq(200, 0),
                 k, s, t);
    syncmer_case(j, "single_n_every_50", [&] {
        std::string q = random_seq(1000, 0);
        for (size_t i = 49; i < q.size(); i += 50) q[i] = 'N';
        return q;
    }(), k, s, t);
    syncmer_case(j, "lowercase", [&] {
        std::string q = random_seq(500, 5);
        for (size_t i = 0; i < q.size(); i += 2) q[i] = (char)tolower(q[i]);
        return q;
    }(), k, s, t);
    // non-ACGTN IUPAC characters must behave like N (dna5 semantics)
    syncmer_case(j, "iupac_chars",
                 random_seq(150, 0) + "RYKMSWBDHV" + random_seq(150, 0),
                 k, s, t);
    syncmer_case(j, "long_10k", random_seq(10000, 1), k, s, t);
    syncmer_case(j, "homopolymer",
                 std::string(80, 'A') + std::string(80, 'C') + random_seq(100, 0),
                 k, s, t);
    j.raw("\n]\n");
}

// ---- fixture 2: xor-filter tables + membership -----------------------------
static void gen_xorfilter(const std::string& dir) {
    Json j((dir + "/xorfilter.json").c_str());
    j.raw("[\n");
    const size_t sizes[] = {100, 1000, 10000};
    for (size_t n : sizes) {
        sm_state = 0xF117E4 + n;
        std::set<uint64_t> uniq;
        while (uniq.size() < n) uniq.insert(splitmix64());
        std::vector<uint64_t> keys(uniq.begin(), uniq.end());

        xorfilter::XorFilter<uint64_t, uint8_t> filt(n);
        alarm(120);  // the in-tree retry loop never terminates on peel failure
        xorfilter::Status rc = filt.AddAll(keys, 0, n);
        alarm(0);
        if (rc != xorfilter::Ok) {
            fprintf(stderr, "xorfilter AddAll failed for n=%zu\n", n);
            exit(1);
        }
        std::vector<uint64_t> present_ok;
        for (auto k : keys) present_ok.push_back(filt.Contain(k) == xorfilter::Ok);
        // absent probes (dedup against the key set)
        std::vector<uint64_t> absent;
        while (absent.size() < 4096) {
            uint64_t a = splitmix64();
            if (!uniq.count(a)) absent.push_back(a);
        }
        std::vector<uint64_t> absent_ok;
        for (auto a : absent) absent_ok.push_back(filt.Contain(a) == xorfilter::Ok);

        j.sep();
        fprintf(j.f,
                "{\"n\":%zu,\"seed\":%" PRIu64
                ",\"array_length\":%zu,\"block_length\":%zu,\"keys\":",
                n, filt.hasher->seed, filt.arrayLength, filt.blockLength);
        emit_u64_array(j.f, keys);
        fputs(",\"fingerprints\":\"", j.f);
        for (size_t i = 0; i < filt.arrayLength; i++)
            fprintf(j.f, "%02x", filt.fingerprints[i]);
        fputs("\",\"present_ok\":", j.f);
        emit_u64_array(j.f, present_ok);
        fputs(",\"absent\":", j.f);
        emit_u64_array(j.f, absent);
        fputs(",\"absent_ok\":", j.f);
        emit_u64_array(j.f, absent_ok);
        fputs("}", j.f);
    }
    j.raw("\n]\n");
}

// ---- fixture 3: threshold-model values -------------------------------------
static void gen_thresholds(const std::string& dir) {
    Json j((dir + "/thresholds.json").c_str());
    j.raw("[\n");

    // kmer model: combination expressions per threshold.hpp:53,63-65
    for (double r : {0.0, 0.01, 0.04, 0.1, 0.15})
        for (size_t k : {18, 20, 22, 26, 30})
            for (size_t cnt : {(size_t)1, (size_t)2, (size_t)10, (size_t)100,
                               (size_t)1000, (size_t)10000}) {
                size_t fp_correction = cnt * 0.0039;
                hixf::threshold::TInterval ci =
                    hixf::threshold::calculate_nmut_kmer_CI(r, k, cnt, 0.95);
                size_t thr = cnt - ci.second - fp_correction;
                j.sep();
                fprintf(j.f,
                        "{\"model\":\"kmer\",\"r\":%.17g,\"k\":%zu,\"count\":%zu,"
                        "\"ci_low\":%zu,\"ci_high\":%zu,\"threshold\":%" PRIu64 "}",
                        r, k, cnt, ci.first, ci.second, (uint64_t)thr);
            }

    // syncmer model: ratio table lookup per threshold.hpp:56-60
    for (size_t k = 12; k <= 30; k += 2)
        for (double r : {0.0, 0.004, 0.01, 0.02, 0.035, 0.05, 0.08, 0.1, 0.15, 0.2})
            for (size_t cnt : {(size_t)1, (size_t)50, (size_t)1234}) {
                double ratio = hixf::threshold::get_min_syncmer_match_ratio(k, r);
                size_t thr = (size_t)(cnt * ratio);
                j.sep();
                fprintf(j.f,
                        "{\"model\":\"syncmer\",\"r\":%.17g,\"k\":%zu,\"count\":%zu,"
                        "\"ratio\":%.17g,\"threshold\":%" PRIu64 "}",
                        r, k, cnt, ratio, (uint64_t)thr);
            }

    // fracminhash model: per threshold.hpp:66-74
    for (double r : {0.01, 0.04, 0.1})
        for (size_t k : {16, 22, 30})
            for (size_t cnt : {(size_t)10, (size_t)100, (size_t)1000, (size_t)12345})
                for (double sc : {0.05, 0.1, 0.2}) {
                    size_t fp_correction = cnt * 0.0039;
                    auto ci = hixf::threshold::calculate_containment_index_CI(
                        r, k, cnt, sc, 0.95);
                    size_t thr = (size_t)(ci.first * cnt) - fp_correction;
                    j.sep();
                    fprintf(j.f,
                            "{\"model\":\"fracminhash\",\"r\":%.17g,\"k\":%zu,"
                            "\"count\":%zu,\"scaling\":%.17g,\"ci_low\":%.17g,"
                            "\"ci_high\":%.17g,\"threshold\":%" PRIu64 "}",
                            r, k, cnt, sc, ci.first, ci.second, (uint64_t)thr);
                }

    // Abramowitz–Stegun inverse normal CDF, direct values
    for (double p : {0.001, 0.025, 0.05, 0.3, 0.5, 0.7, 0.95, 0.975, 0.999}) {
        double z = hixf::threshold::NormalCDFInverse(p);
        j.sep();
        fprintf(j.f, "{\"model\":\"gaussian_inverse\",\"p\":%.17g,\"z\":%.17g}", p, z);
    }
    j.raw("\n]\n");
}

int main(int argc, char** argv) {
    if (argc != 2) {
        fprintf(stderr, "usage: %s <output-dir>\n", argv[0]);
        return 2;
    }
    std::string dir = argv[1];
    gen_syncmer(dir);
    gen_xorfilter(dir);
    gen_thresholds(dir);
    printf("golden fixtures written to %s\n", dir.c_str());
    return 0;
}
