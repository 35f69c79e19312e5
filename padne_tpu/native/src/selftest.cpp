// Development self-test for the native geometry core.
#include "pg_refine.h"

#include <cstdio>

using namespace pg;

static int failures = 0;
#define CHECK(cond)                                                    \
  do {                                                                 \
    if (!(cond)) {                                                     \
      printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);           \
      failures++;                                                      \
    }                                                                  \
  } while (0)

static Ring make_rect(i64 x0, i64 y0, i64 x1, i64 y1) {
  Ring r;
  r.pts = {{x0, y0}, {x1, y0}, {x1, y1}, {x0, y1}};
  return r;
}

static double polyset_area(const PolySet& ps) {
  double total = 0;
  for (const auto& poly : ps.polys)
    for (const auto& ring : poly.rings)
      total += (double)ring_signed_area2(ring.pts) / 2.0;
  return total;
}

int main() {
  // --- predicates ---
  CHECK(orient2d({0, 0}, {1, 0}, {0, 1}) > 0);
  CHECK(orient2d({0, 0}, {1, 0}, {2, 0}) == 0);
  CHECK(orient2d({0, 0}, {1, 0}, {1, -1}) < 0);
  CHECK(incircle({0, 0}, {2, 0}, {0, 2}, {1, 1}) > 0);
  CHECK(incircle({0, 0}, {2, 0}, {0, 2}, {2, 2}) == 0);
  CHECK(incircle({0, 0}, {2, 0}, {0, 2}, {3, 3}) < 0);
  // Big-coordinate exactness: nearly-cocircular far points.
  i64 B = (i64)1 << 31;
  CHECK(incircle({-B, -B}, {B, -B}, {B, B}, {-B, B}) == 0);
  CHECK(incircle({-B, -B}, {B, -B}, {B, B}, {-B, B - 1}) > 0);
  CHECK(incircle({-B, -B}, {B, -B}, {B, B}, {-B, B + 1}) < 0);

  // --- plain CDT insertion ---
  {
    CDT cdt;
    for (int i = 0; i < 200; i++) {
      i64 x = (i64)((i * 7919) % 1000) * 1000 - 500000;
      i64 y = (i64)((i * 104729) % 1000) * 1000 - 500000;
      cdt.insert_point({x, y});
    }
    cdt.validate();
    // duplicate insertion returns existing
    int v1 = cdt.insert_point({12345, 54321});
    int v2 = cdt.insert_point({12345, 54321});
    CHECK(v1 == v2);
    cdt.validate();
  }

  // --- union of two overlapping unit squares (1e6 units = 1 mm) ---
  {
    std::vector<Ring> a{make_rect(0, 0, 1000000, 1000000)};
    std::vector<Ring> b{make_rect(500000, 0, 1500000, 1000000)};
    PolySet ps = boolean_op(BoolOp::UNION, a, b);
    CHECK(ps.polys.size() == 1);
    CHECK(ps.polys[0].rings.size() == 1);
    double area = polyset_area(ps);
    CHECK(std::abs(area - 1.5e12) < 1.0);
  }

  // --- difference producing a hole ---
  {
    std::vector<Ring> a{make_rect(0, 0, 1000000, 1000000)};
    std::vector<Ring> b{make_rect(250000, 250000, 750000, 750000)};
    PolySet ps = boolean_op(BoolOp::DIFFERENCE, a, b);
    CHECK(ps.polys.size() == 1);
    CHECK(ps.polys[0].rings.size() == 2);
    double area = polyset_area(ps);
    CHECK(std::abs(area - 0.75e12) < 1.0);
    // outer CCW, hole CW
    CHECK(ring_signed_area2(ps.polys[0].rings[0].pts) > 0);
    CHECK(ring_signed_area2(ps.polys[0].rings[1].pts) < 0);
  }

  // --- intersection ---
  {
    std::vector<Ring> a{make_rect(0, 0, 1000000, 1000000)};
    std::vector<Ring> b{make_rect(500000, 500000, 1500000, 1500000)};
    PolySet ps = boolean_op(BoolOp::INTERSECTION, a, b);
    CHECK(ps.polys.size() == 1);
    CHECK(std::abs(polyset_area(ps) - 0.25e12) < 1.0);
  }

  // --- disjoint union -> two polygons ---
  {
    std::vector<Ring> a{make_rect(0, 0, 1000000, 1000000),
                        make_rect(2000000, 0, 3000000, 1000000)};
    std::vector<Ring> b;
    PolySet ps = boolean_op(BoolOp::UNION, a, b);
    CHECK(ps.polys.size() == 2);
  }

  // --- union with shared edge (collinear overlap) ---
  {
    std::vector<Ring> a{make_rect(0, 0, 1000000, 1000000),
                        make_rect(1000000, 0, 2000000, 1000000)};
    std::vector<Ring> b;
    PolySet ps = boolean_op(BoolOp::UNION, a, b);
    CHECK(ps.polys.size() == 1);
    CHECK(std::abs(polyset_area(ps) - 2e12) < 1.0);
  }

  // --- self-intersecting bowtie with nonzero rule ---
  {
    Ring bow;
    bow.pts = {{0, 0}, {1000000, 1000000}, {1000000, 0}, {0, 1000000}};
    PolySet ps = boolean_op(BoolOp::UNION, {bow}, {});
    // Nonzero rule: two triangles of total area 0.5 mm^2.
    CHECK(std::abs(polyset_area(ps) - 0.5e12) < 1e4);
  }

  // --- triangulation of a square, uniform sizing ---
  {
    std::vector<Ring> rings{make_rect(0, 0, 10000000, 10000000)};  // 10x10 mm
    RefineConfig cfg;
    cfg.minimum_angle_deg = 20;
    cfg.maximum_size_mm = 1.0;
    cfg.vd_size_factor = 1.0;
    MeshResult mr = triangulate_polygon(rings, {}, cfg, nullptr);
    CHECK(mr.tri.size() >= 3);
    double area = 0;
    double min_sine2 = 1e9;
    double max_edge = 0;
    size_t nt = mr.tri.size() / 3;
    for (size_t t = 0; t < nt; t++) {
      double x[3], y[3];
      for (int i = 0; i < 3; i++) {
        x[i] = mr.vx_mm[mr.tri[3 * t + i]];
        y[i] = mr.vy_mm[mr.tri[3 * t + i]];
      }
      double a2 = std::abs((x[1] - x[0]) * (y[2] - y[0]) -
                           (y[1] - y[0]) * (x[2] - x[0]));
      area += a2 / 2;
      double l2[3];
      for (int i = 0; i < 3; i++) {
        double dx = x[(i + 1) % 3] - x[(i + 2) % 3];
        double dy = y[(i + 1) % 3] - y[(i + 2) % 3];
        l2[i] = dx * dx + dy * dy;
        max_edge = std::max(max_edge, std::sqrt(l2[i]));
      }
      double mx = std::max({l2[0], l2[1], l2[2]});
      double mn = std::min({l2[0], l2[1], l2[2]});
      double mid = l2[0] + l2[1] + l2[2] - mx - mn;
      min_sine2 = std::min(min_sine2, a2 * a2 / (mx * mid));
    }
    printf("square mesh: %zu tris, %zu verts, area=%.6f, max_edge=%.3f, "
           "min_angle=%.2f deg\n",
           nt, mr.vx_mm.size(), area, max_edge,
           asin(std::sqrt(min_sine2)) * 180 / M_PI);
    CHECK(std::abs(area - 100.0) < 1e-6);
    CHECK(max_edge <= 1.0 + 1e-9);
    double s20 = std::sin(20.0 * M_PI / 180);
    CHECK(min_sine2 >= s20 * s20 * 0.999);
  }

  // --- triangulation with hole + seed vertex ---
  {
    std::vector<Ring> rings{make_rect(0, 0, 10000000, 10000000)};
    Ring hole = make_rect(4000000, 4000000, 6000000, 6000000);
    std::reverse(hole.pts.begin(), hole.pts.end());  // CW hole
    rings.push_back(hole);
    RefineConfig cfg;
    cfg.minimum_angle_deg = 20;
    cfg.maximum_size_mm = 1.0;
    cfg.vd_size_factor = 1.0;
    std::vector<Pt> seeds{{1234567, 7654321}};
    MeshResult mr = triangulate_polygon(rings, seeds, cfg, nullptr);
    double area = 0;
    size_t nt = mr.tri.size() / 3;
    bool seed_present = false;
    for (size_t i = 0; i < mr.vx_mm.size(); i++)
      if (std::abs(mr.vx_mm[i] - 1.234567) < 1e-9 &&
          std::abs(mr.vy_mm[i] - 7.654321) < 1e-9)
        seed_present = true;
    for (size_t t = 0; t < nt; t++) {
      double x[3], y[3];
      for (int i = 0; i < 3; i++) {
        x[i] = mr.vx_mm[mr.tri[3 * t + i]];
        y[i] = mr.vy_mm[mr.tri[3 * t + i]];
      }
      area += std::abs((x[1] - x[0]) * (y[2] - y[0]) -
                       (y[1] - y[0]) * (x[2] - x[0])) / 2;
    }
    printf("holey mesh: %zu tris, area=%.6f (expect 96)\n", nt, area);
    CHECK(std::abs(area - 96.0) < 1e-6);
    CHECK(seed_present);
  }

  // --- variable density: far-from-boundary triangles larger ---
  {
    std::vector<Ring> rings{make_rect(0, 0, 20000000, 20000000)};  // 20x20 mm
    RefineConfig cfg;
    cfg.minimum_angle_deg = 20;
    cfg.maximum_size_mm = 0.6;
    cfg.vd_min_distance_mm = 0.5;
    cfg.vd_max_distance_mm = 3.0;
    cfg.vd_size_factor = 3.0;
    DistanceMap dm = build_distance_map(rings, 1.0);
    // distance at center ~ 10 mm
    CHECK(std::abs(dm.query(10.0, 10.0) - 10.0) < 1.0);
    CHECK(dm.query(-1.5, -1.5) == 0.0);
    MeshResult uniform, variable;
    {
      RefineConfig c2 = cfg;
      c2.vd_size_factor = 1.0;
      uniform = triangulate_polygon(rings, {}, c2, nullptr);
    }
    variable = triangulate_polygon(rings, {}, cfg, &dm);
    printf("uniform %zu tris vs variable %zu tris\n", uniform.tri.size() / 3,
           variable.tri.size() / 3);
    CHECK(variable.tri.size() < uniform.tri.size());
  }

  printf(failures ? "SELFTEST FAILED (%d)\n" : "SELFTEST OK\n", failures);
  return failures ? 1 : 0;
}
