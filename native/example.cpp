// Minimal native example (the examples/bsqp.cu analogue for the native
// runtime): load the indy7 model constants exported by the Python parser,
// simulate a passive rollout and print dynamics quantities.
//
// Build & run:
//   python -c "from gato_tpu.native import export_model_bin; export_model_bin('indy7', '/tmp/indy7.bin')"
//   g++ -O3 -std=c++17 -o native_example native/example.cpp native/librbd.so -Wl,-rpath,native
//   ./native_example /tmp/indy7.bin

#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void* rbd_create(int nq, const double*, const double*, const double*,
                 const double*, double gravity);
void rbd_destroy(void*);
void rbd_fd(void*, const double*, const double*, const double*, const double*,
            double*);
void rbd_fk_ee(void*, const double*, double*);
void rbd_rk4(void*, const double*, const double*, double, const double*,
             double*);
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s model.bin\n", argv[0]);
        return 1;
    }
    FILE* f = std::fopen(argv[1], "rb");
    if (!f) { std::perror("open"); return 1; }
    int nq = 0;
    if (std::fread(&nq, sizeof(int), 1, f) != 1 || nq <= 0 || nq > 16) {
        std::fprintf(stderr, "bad model file\n");
        return 1;
    }
    std::vector<double> R(nq * 9), p(nq * 3), ax(nq * 3), I(nq * 36);
    bool ok = std::fread(R.data(), 8, R.size(), f) == R.size()
        && std::fread(p.data(), 8, p.size(), f) == p.size()
        && std::fread(ax.data(), 8, ax.size(), f) == ax.size()
        && std::fread(I.data(), 8, I.size(), f) == I.size();
    std::fclose(f);
    if (!ok) { std::fprintf(stderr, "truncated model file\n"); return 1; }

    void* h = rbd_create(nq, R.data(), p.data(), ax.data(), I.data(), 9.81);

    std::vector<double> x(2 * nq, 0.0), u(nq, 0.0), xn(2 * nq);
    double ee[6];
    rbd_fk_ee(h, x.data(), ee);
    std::printf("EE at q=0: [%.4f %.4f %.4f]\n", ee[0], ee[1], ee[2]);

    // passive 100 ms rollout under gravity
    for (int k = 0; k < 100; ++k) {
        rbd_rk4(h, x.data(), u.data(), 1e-3, nullptr, xn.data());
        x = xn;
    }
    std::printf("q after 100ms free fall: ");
    for (int i = 0; i < nq; ++i) std::printf("%.5f ", x[i]);
    std::printf("\n");
    rbd_destroy(h);
    return 0;
}
