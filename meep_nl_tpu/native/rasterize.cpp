// Native geometry rasterizer: the hot inner loop of the setup pass
// (the role filled by C++ meepgeom.cpp/libctlgeom in the reference).
//
// Evaluates, for a batch of sample points, the index of the governing
// object containing each point (libctlgeom convention: earlier objects take
// precedence).  Supersampled subpixel smoothing makes this loop
// O(subsample^d * N^d * objects); the C++ version is ~50x the NumPy
// broadcast chain for many-object scenes and is exposed through ctypes
// (no pybind11 in this environment).
//
// Object serialization (one row of NPARAM doubles per object):
//   [0] type: 0=sphere, 1=block, 2=cylinder, 3=ellipsoid
//   [1..3]   center x,y,z
//   sphere:   [4] radius
//   block:    [4..6] half sizes along e1,e2,e3; [7..15] e1,e2,e3 unit vecs
//   cylinder: [4] radius, [5] half height, [6..8] axis unit vec
//   ellipsoid:[4..6] half sizes; [7..15] basis vecs (like block)

#include <cstdint>
#include <cmath>

extern "C" {

static const int NPARAM = 16;

static inline bool inside_one(const double *o, double x, double y, double z) {
    double dx = x - o[1], dy = y - o[2], dz = z - o[3];
    int type = (int)o[0];
    switch (type) {
    case 0: { // sphere
        double r = o[4];
        return dx * dx + dy * dy + dz * dz <= r * r;
    }
    case 1: { // block
        for (int k = 0; k < 3; ++k) {
            const double *e = o + 7 + 3 * k;
            double proj = dx * e[0] + dy * e[1] + dz * e[2];
            double half = o[4 + k];
            if (half < 1e30 && (proj > half + 1e-12 || proj < -half - 1e-12))
                return false;
        }
        return true;
    }
    case 2: { // cylinder
        const double *a = o + 6;
        double zproj = dx * a[0] + dy * a[1] + dz * a[2];
        double px = dx - zproj * a[0], py = dy - zproj * a[1],
               pz = dz - zproj * a[2];
        double r = o[4], hh = o[5];
        if (hh < 1e30 && (zproj > hh || zproj < -hh)) return false;
        return px * px + py * py + pz * pz <= r * r;
    }
    case 3: { // ellipsoid
        double rsum = 0;
        for (int k = 0; k < 3; ++k) {
            const double *e = o + 7 + 3 * k;
            double half = o[4 + k];
            if (half <= 0) continue;
            double proj = (dx * e[0] + dy * e[1] + dz * e[2]) / half;
            rsum += proj * proj;
        }
        return rsum <= 1.0;
    }
    default:
        return false;
    }
}

// pts: npts x 3 doubles; objs: nobj x NPARAM; out: npts int32 (first-hit
// object index or -1)
void material_at(const double *pts, int64_t npts, const double *objs,
                 int64_t nobj, int32_t *out) {
    for (int64_t i = 0; i < npts; ++i) {
        double x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
        int32_t hit = -1;
        // later objects take precedence (Python_User_Interface.md:136):
        // scan from the END of the list, first hit wins
        for (int64_t j = nobj - 1; j >= 0; --j) {
            if (inside_one(objs + j * NPARAM, x, y, z)) {
                hit = (int32_t)j;
                break;
            }
        }
        out[i] = hit;
    }
}

// supersampled epsilon averaging in one pass: for each site, average
// eps over noff offsets; eps_of maps object index -> eps (diagonal entry)
void eps_averaged(const double *pts, int64_t npts, const double *offs,
                  int64_t noff, const double *objs, int64_t nobj,
                  const double *eps_of, double eps_default,
                  double *mean_eps, double *mean_inv) {
    for (int64_t i = 0; i < npts; ++i) {
        double x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
        double se = 0, si = 0;
        for (int64_t k = 0; k < noff; ++k) {
            double px = x + offs[3 * k], py = y + offs[3 * k + 1],
                   pz = z + offs[3 * k + 2];
            double e = eps_default;
            for (int64_t j = nobj - 1; j >= 0; --j) {   // later object wins
                if (inside_one(objs + j * NPARAM, px, py, pz)) {
                    e = eps_of[j];
                    break;
                }
            }
            se += e;
            si += 1.0 / e;
        }
        mean_eps[i] = se / (double)noff;
        mean_inv[i] = si / (double)noff;
    }
}

}  // extern "C"
