// Probe for libstdc++ unordered_map/set internals, used to fuzz-verify the
// pure-Python iteration-order emulator (danbing_tk_tpu/utils/stdumap.py).
//
// The reference toolchain serializes hash maps in iteration order, so
// byte-exact output requires reproducing libstdc++'s node ordering.  This
// probe is *our* tool (not reference code): it feeds insertion sequences to
// a real std::unordered_map and reports iteration order and bucket growth.
//
// Modes:
//   primes            : dump _Prime_rehash_policy::_M_next_bkt for a sweep
//   order             : read u64 keys (one per line) from stdin; print
//                       "bc <bucket_count>" then iteration order after all
//                       inserts, plus bucket_count after each insert on fd 2.
//   ops               : read "i <key>" / "e <key>" lines; print final
//                       iteration order (exercises erase).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

int main(int argc, char** argv) {
    if (argc > 1 && !strcmp(argv[1], "primes")) {
        std::__detail::_Prime_rehash_policy pol;
        // sweep: for each n, smallest prime >= n (the bucket-count table)
        unsigned long prev = 0;
        for (unsigned long n = 1; n < (1UL << 32); ) {
            unsigned long p = pol._M_next_bkt(n);
            if (p != prev) { printf("%lu\n", p); prev = p; }
            n = p + 1;
        }
        return 0;
    }
    if (argc > 1 && !strcmp(argv[1], "ops")) {
        std::unordered_map<uint64_t, uint64_t> m;
        char op;
        uint64_t k;
        while (scanf(" %c %lu", &op, &k) == 2) {
            if (op == 'i') m[k] += 1;
            else if (op == 'e') m.erase(k);
        }
        for (auto& p : m) printf("%lu\n", (unsigned long)p.first);
        return 0;
    }
    std::unordered_map<uint64_t, uint64_t> m;
    uint64_t k;
    std::vector<uint64_t> bcs;
    while (scanf("%lu", &k) == 1) {
        m[k] += 1;
        bcs.push_back(m.bucket_count());
    }
    for (auto b : bcs) fprintf(stderr, "%lu\n", b);
    for (auto& p : m) printf("%lu\n", (unsigned long)p.first);
    return 0;
}
