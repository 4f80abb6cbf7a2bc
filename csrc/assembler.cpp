// Native AOT assembly kernels for the structured-grid FEM setup path.
//
// The reference delegates its assembly to dolfinx's C++ core
// (Multigrid_prototype.py:88-110); this library is the equivalent native
// component for the TPU framework's setup path: it assembles P1
// stiffness/mass stencil planes and load vectors on structured simplicial
// grids (2D right-triangle pairs / 3D Kuhn tetrahedra) with optional
// per-cell variable coefficients, writing directly into caller-provided
// numpy buffers.  Used by fem/native.py via ctypes; the pure-numpy
// assembler remains as the portable fallback and correctness oracle.
//
// Conventions (must match fem/assembly.py):
//   * planes buffer: (K, m^d) row-major doubles, K = 3^d sorted offsets
//     of {-1,0,1}^d (lexicographic); caller zero-initializes.
//   * node (i, j[, k]) at (i*h, j*h[, k*h]); cell (ci, cj[, ck]) spans
//     [ci*h, (ci+1)*h] x ...
//   * kappa: per-cell coefficient array (n^d doubles) or nullptr.

#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- small dense helpers -------------------------------------------------

template <int D>
struct Simplex {
    // vertex offsets within the unit cell (integer 0/1 corners)
    std::array<std::array<int, D>, D + 1> v;
};

// P1 element stiffness for a simplex with physical vertices pts (rows).
// K[a][b] = vol * grad(lam_a) . grad(lam_b)
template <int D>
void p1_stiffness(const double pts[D + 1][D], double K[D + 1][D + 1],
                  double* vol_out) {
    // Solve A C = I with A rows [1, x...] to get barycentric gradients.
    double A[D + 1][D + 1];
    for (int r = 0; r < D + 1; ++r) {
        A[r][0] = 1.0;
        for (int c = 0; c < D; ++c) A[r][c + 1] = pts[r][c];
    }
    // Gauss-Jordan inverse of (D+1)x(D+1)
    double inv[D + 1][D + 1];
    double work[D + 1][2 * (D + 1)];
    for (int r = 0; r < D + 1; ++r) {
        for (int c = 0; c < D + 1; ++c) {
            work[r][c] = A[r][c];
            work[r][D + 1 + c] = (r == c) ? 1.0 : 0.0;
        }
    }
    double det = 1.0;
    for (int col = 0; col < D + 1; ++col) {
        int piv = col;
        for (int r = col + 1; r < D + 1; ++r)
            if (std::fabs(work[r][col]) > std::fabs(work[piv][col])) piv = r;
        if (piv != col) {
            for (int c = 0; c < 2 * (D + 1); ++c)
                std::swap(work[col][c], work[piv][c]);
            det = -det;
        }
        det *= work[col][col];
        double p = work[col][col];
        for (int c = 0; c < 2 * (D + 1); ++c) work[col][c] /= p;
        for (int r = 0; r < D + 1; ++r) {
            if (r == col) continue;
            double fac = work[r][col];
            for (int c = 0; c < 2 * (D + 1); ++c)
                work[r][c] -= fac * work[col][c];
        }
    }
    for (int r = 0; r < D + 1; ++r)
        for (int c = 0; c < D + 1; ++c) inv[r][c] = work[r][D + 1 + c];

    // vol = |det(A)| / D!
    double fact = 1.0;
    for (int i = 2; i <= D; ++i) fact *= i;
    double vol = std::fabs(det) / fact;
    *vol_out = vol;

    // grad(lam_a) = inv[1..D][a]
    for (int a = 0; a < D + 1; ++a) {
        for (int b = 0; b < D + 1; ++b) {
            double dot = 0.0;
            for (int d = 0; d < D; ++d) dot += inv[d + 1][a] * inv[d + 1][b];
            K[a][b] = vol * dot;
        }
    }
}

// offset (do_0.., values in {-1,0,1}) -> sorted plane index
template <int D>
inline int plane_index(const int* off) {
    int idx = 0;
    for (int d = 0; d < D; ++d) idx = idx * 3 + (off[d] + 1);
    return idx;
}

template <int D>
void assemble_impl(int64_t n, double h, const Simplex<D>* simplices,
                   int nsimp, const double* kappa, double* planes,
                   double* mass_planes, double* b, double f) {
    const int NV = D + 1;
    const int64_t m = n + 1;
    int64_t mpow[D];  // strides of the node grid
    mpow[D - 1] = 1;
    for (int d = D - 2; d >= 0; --d) mpow[d] = mpow[d + 1] * m;
    const int64_t msize = mpow[0] * m;

    for (int s = 0; s < nsimp; ++s) {
        const auto& sim = simplices[s];
        double pts[D + 1][D];
        for (int a = 0; a < NV; ++a)
            for (int d = 0; d < D; ++d) pts[a][d] = sim.v[a][d] * h;
        double K[D + 1][D + 1];
        double vol;
        p1_stiffness<D>(pts, K, &vol);
        const double mass_diag = vol / ((D + 2) * (D + 1) / 1.0) * 2.0;
        const double mass_off = vol / ((D + 2) * (D + 1) / 1.0);
        const double load = f * vol / NV;

        // iterate cells
        std::vector<int64_t> cell(D, 0);
        const int64_t ncells = [&] {
            int64_t t = 1;
            for (int d = 0; d < D; ++d) t *= n;
            return t;
        }();
        for (int64_t ci = 0; ci < ncells; ++ci) {
            // decode cell coords
            int64_t rem = ci;
            int64_t coords[D];
            for (int d = D - 1; d >= 0; --d) {
                coords[d] = rem % n;
                rem /= n;
            }
            double kc = kappa ? kappa[ci] : 1.0;
            // node flat indices of the simplex vertices
            int64_t nodes[D + 1];
            for (int a = 0; a < NV; ++a) {
                int64_t flat = 0;
                for (int d = 0; d < D; ++d)
                    flat += (coords[d] + sim.v[a][d]) * mpow[d];
                nodes[a] = flat;
            }
            for (int a = 0; a < NV; ++a) {
                b[nodes[a]] += load;
                for (int bb = 0; bb < NV; ++bb) {
                    int off[D];
                    for (int d = 0; d < D; ++d)
                        off[d] = sim.v[bb][d] - sim.v[a][d];
                    const int pk = plane_index<D>(off);
                    planes[pk * msize + nodes[a]] += K[a][bb] * kc;
                    if (mass_planes) {
                        mass_planes[pk * msize + nodes[a]] +=
                            (a == bb) ? mass_diag : mass_off;
                    }
                }
            }
        }
    }
}

}  // namespace

extern "C" {

// 2D: planes (9, m*m), mass_planes (9, m*m) or nullptr, b (m*m), all
// zero-initialized by the caller.  kappa: (2, n*n) per-simplex-per-cell or
// nullptr.  diagonal_right selects the triangulation diagonal.
void assemble_p1_2d(int64_t n, double h, int diagonal_right,
                    const double* kappa, double* planes,
                    double* mass_planes, double* b, double f) {
    Simplex<2> tris[2];
    if (diagonal_right) {
        tris[0].v = {{{0, 0}, {1, 0}, {1, 1}}};
        tris[1].v = {{{0, 0}, {1, 1}, {0, 1}}};
    } else {
        tris[0].v = {{{0, 0}, {1, 0}, {0, 1}}};
        tris[1].v = {{{1, 0}, {1, 1}, {0, 1}}};
    }
    for (int s = 0; s < 2; ++s) {
        const double* ks = kappa ? kappa + s * n * n : nullptr;
        assemble_impl<2>(n, h, &tris[s], 1, ks, planes, mass_planes, b, f);
    }
}

// 3D Kuhn decomposition (6 tets over vertex permutations).
// diagonal_right = 0 mirrors component 0 of every vertex (the uniform
// mirrored Kuhn mesh — must match fem.assembly.simplex_vertex_offsets'
// 'left' convention, which the numpy fallback uses).
void assemble_p1_3d(int64_t n, double h, int diagonal_right,
                    const double* kappa, double* planes,
                    double* mass_planes, double* b, double f) {
    static const int perms[6][3] = {{0, 1, 2}, {0, 2, 1}, {1, 0, 2},
                                    {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};
    Simplex<3> tets[6];
    for (int p = 0; p < 6; ++p) {
        int cur[3] = {0, 0, 0};
        tets[p].v[0] = {0, 0, 0};
        for (int step = 0; step < 3; ++step) {
            cur[perms[p][step]] = 1;
            tets[p].v[step + 1] = {cur[0], cur[1], cur[2]};
        }
        if (!diagonal_right) {
            for (int k = 0; k < 4; ++k) {
                tets[p].v[k][0] = 1 - tets[p].v[k][0];
            }
        }
    }
    for (int s = 0; s < 6; ++s) {
        const double* ks = kappa ? kappa + (int64_t)s * n * n * n : nullptr;
        assemble_impl<3>(n, h, &tets[s], 1, ks, planes, mass_planes, b, f);
    }
}

}  // extern "C"
