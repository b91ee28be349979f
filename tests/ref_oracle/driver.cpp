// Test-only driver that links the UNMODIFIED reference implementation
// (/root/reference/ddsketch.cc) to produce ground truth for parity tests.
// This file is original; it only calls the reference's public C API
// (ddsketch.h). Usage:
//   driver <collapse_type 1|2|3> <bin_limit> <alpha> <values_file> <mode>
// modes:
//   build  - insert all values, print state + quantile grid
//   merge  - build two sketches from the two halves, merge, print
//   delete - insert all, then delete all, print n and size
// Output: lines "N <n>", "BIN <key> <count>" (stored keys), "Q <q> <est>".
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>
#include "ddsketch.h"

static int add(DDS_type* s, double v, int t) {
    if (t == 1) return DDS_AddCollapse(s, v);
    if (t == 2) return DDS_AddCollapseLastBucket(s, v);
    return DDS_AddCollapseFirstBucket(s, v);
}
static int del(DDS_type* s, double v, int t) {
    if (t == 1) return DDS_DeleteCollapse(s, v);
    if (t == 2) return DDS_DeleteCollapseLastBucket(s, v);
    return DDS_DeleteCollapseFirstBucket(s, v);
}
static int mrg(DDS_type* a, DDS_type* b, int t) {
    if (t == 1) return DDS_MergeCollapse(a, b);
    if (t == 2) return DDS_MergeCollapseLastBucket(a, b);
    return DDS_MergeCollapseFirstBucket(a, b);
}

static void dump(DDS_type* s) {
    printf("N %d\n", s->n);
    printf("ALPHA %.17g\n", s->alpha);
    for (auto& kv : *(s->bins)) printf("BIN %d %d\n", kv.first, kv.second);
    double qs[] = {0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99};
    if (s->n > 0) {
        for (double q : qs) {
            double est = 0;
            if (DDS_GetQuantile(s, (float)q, est) == 0) printf("Q %.2f %.17g\n", q, est);
        }
    }
}

int main(int argc, char** argv) {
    if (argc < 6) return 2;
    int type = atoi(argv[1]);
    int bin_limit = atoi(argv[2]);
    double alpha = atof(argv[3]);
    const char* path = argv[4];
    std::string mode = argv[5];

    std::vector<double> vals;
    FILE* f = fopen(path, "r");
    if (!f) return 3;
    double v;
    while (fscanf(f, "%lf", &v) == 1) vals.push_back(v);
    fclose(f);

    int offset = 1073741824;
    if (mode == "build") {
        DDS_type* s = DDS_Init(offset, bin_limit, alpha);
        for (double x : vals) add(s, x, type);
        dump(s);
    } else if (mode == "merge") {
        DDS_type* a = DDS_Init(offset, bin_limit, alpha);
        DDS_type* b = DDS_Init(offset, bin_limit, alpha);
        size_t h = vals.size() / 2;
        for (size_t i = 0; i < h; i++) add(a, vals[i], type);
        for (size_t i = h; i < vals.size(); i++) add(b, vals[i], type);
        if (mrg(a, b, type) < 0) { printf("MERGE_ERROR\n"); return 0; }
        dump(a);
    } else if (mode == "mergeab") {
        // cross-config merge: sketch a at alpha, sketch b at argv[6],
        // exercising the reference's |a1-a2|<=1e-4 alignment loop
        if (argc < 7) return 2;
        double alpha2 = atof(argv[6]);
        DDS_type* a = DDS_Init(offset, bin_limit, alpha);
        DDS_type* b = DDS_Init(offset, bin_limit, alpha2);
        size_t h = vals.size() / 2;
        for (size_t i = 0; i < h; i++) add(a, vals[i], type);
        for (size_t i = h; i < vals.size(); i++) add(b, vals[i], type);
        if (mrg(a, b, type) < 0) { printf("MERGE_ERROR\n"); return 0; }
        dump(a);
    } else if (mode == "csv") {
        // build, then dump bins through the reference's own CSV writer
        // (DDS_PrintCSV -> GetBounds(key-1, key)) to argv[6]
        if (argc < 7) return 2;
        DDS_type* s = DDS_Init(offset, bin_limit, alpha);
        for (double x : vals) add(s, x, type);
        DDS_PrintCSV(s, std::string(argv[6]));
        printf("N %d\n", s->n);
    } else if (mode == "delete") {
        DDS_type* s = DDS_Init(offset, bin_limit, alpha);
        for (double x : vals) add(s, x, type);
        for (double x : vals) del(s, x, type);
        int size = 0; DDS_Size(s, size);
        printf("N %d\n", s->n);
        printf("SIZE %d\n", size);
    }
    return 0;
}
