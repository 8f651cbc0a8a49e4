package graft

import graft.functions.{GeoFunctions, GeoOverlay}
import graft.functions.GeoFunctions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the planar-arrangement overlay core (reference
  * semantics: presto-geospatial/.../GeoFunctions.java stIntersection
  * :989, stUnion :589, stDifference, stSymDifference, stBuffer :283,
  * stRelate :1133 — all via the Esri core there). Closed-form cases:
  * axis-aligned and sheared rectangles/triangles whose overlay areas are
  * computable by hand, plus exactly the degenerate contacts (shared
  * edges, corner touches, holes, multi-ring output) that clip-only
  * algorithms mishandle.
  */
class GeoOverlaySpec extends AnyFunSuite {

  private def p(wkt: String): Geom = GeoFunctions.parse(wkt)
  private def inter(a: String, b: String): Geom =
    GeoOverlay.intersectionAreal(p(a), p(b))
  private def uni(a: String, b: String): Geom =
    GeoOverlay.overlayAreal(Vector(p(a), p(b)), m => m(0) || m(1))
  private def diff(a: String, b: String): Geom =
    GeoOverlay.overlayAreal(Vector(p(a), p(b)), m => m(0) && !m(1))
  private def xor(a: String, b: String): Geom =
    GeoOverlay.overlayAreal(Vector(p(a), p(b)), m => m(0) ^ m(1))

  private val sq10 = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"

  test("overlapping rectangles: intersection/union/difference areas are exact") {
    val b = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
    assert(area(inter(sq10, b)) === 25.0)
    assert(area(uni(sq10, b)) === 175.0)
    assert(area(diff(sq10, b)) === 75.0)
    assert(area(xor(sq10, b)) === 150.0)
    // intersection is the exact 5x5 square
    assert(geomEquals(inter(sq10, b),
      p("POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))")).contains(true))
  }

  test("sheared overlay: triangle clipped by rectangle") {
    // right triangle (0,0)-(10,0)-(0,10); rectangle x in [0,10], y in [0,3]
    val tri = "POLYGON ((0 0, 10 0, 0 10, 0 0))"
    val band = "POLYGON ((0 0, 10 0, 10 3, 0 3, 0 0))"
    // clipped area: trapezoid with parallel sides 10 and 7, height 3
    assert(math.abs(area(inter(tri, band)) - 25.5) < 1e-9)
    assert(math.abs(area(uni(tri, band)) - (50 + 30 - 25.5)) < 1e-9)
    assert(math.abs(area(diff(tri, band)) - 24.5) < 1e-9)
  }

  test("difference cuts a hole; union fills it back") {
    val holeSq = "POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))"
    val donut = diff(sq10, holeSq)
    assert(area(donut) === 84.0)
    donut match {
      case GPolygon(rings) => assert(rings.length === 2, "shell + hole expected")
      case other => fail(s"expected POLYGON with hole, got ${GeoFunctions.print(other)}")
    }
    // union of the donut with the hole restores the full square
    assert(area(GeoOverlay.overlayAreal(Vector(donut, p(holeSq)),
      m => m(0) || m(1))) === 100.0)
    // intersection of the donut with the open hole is empty 2D
    assert(area(GeoOverlay.overlayAreal(Vector(donut, p(holeSq)),
      m => m(0) && m(1))) === 0.0)
  }

  test("hole input is respected: donut minus plug leaves the ring") {
    val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    val plug = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))" // inside the hole
    assert(area(diff(donut, plug)) === 84.0) // plug is not in the donut at all
    assert(area(uni(donut, plug)) === 88.0)  // plug floats inside the hole
    uni(donut, plug) match {
      case GMultiPolygon(parts) => assert(parts.length === 2)
      case other => fail(s"expected MULTIPOLYGON, got ${GeoFunctions.print(other)}")
    }
  }

  test("disjoint squares union to a multipolygon; intersection is empty") {
    val b = "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"
    uni(sq10, b) match {
      case GMultiPolygon(parts) => assert(parts.length === 2)
      case other => fail(s"expected MULTIPOLYGON, got ${GeoFunctions.print(other)}")
    }
    assert(area(uni(sq10, b)) === 200.0)
    assert(isEmpty(inter(sq10, b)))
  }

  test("degenerate contact: shared edge intersects in a line, corner in a point") {
    val right = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"
    val shared = inter(sq10, right)
    assert(GeoFunctions.print(shared) === "LINESTRING (10 0, 10 10)",
      GeoFunctions.print(shared))
    // union across the shared edge dissolves it into one rectangle
    val fused = uni(sq10, right)
    assert(area(fused) === 200.0)
    fused match {
      case GPolygon(rings) =>
        assert(rings.length === 1)
        // the outline passes through the dissolved edge's endpoints, so
        // check the 4 true corners are present and the shared edge's
        // interior is gone (no vertex strictly between (10,0)-(10,10)
        // other than its endpoints)
        val vs = rings.head.toSet
        assert(Set(Pt(0, 0), Pt(20, 0), Pt(20, 10), Pt(0, 10)).subsetOf(vs))
        assert(!vs.exists(v => v.x == 10 && v.y > 0 && v.y < 10))
      case other => fail(s"expected single POLYGON, got ${GeoFunctions.print(other)}")
    }
    val corner = inter(sq10, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
    assert(GeoFunctions.print(corner) === "POINT (10 10)", GeoFunctions.print(corner))
  }

  test("equal inputs: intersection/union identity, difference empty") {
    assert(area(inter(sq10, sq10)) === 100.0)
    assert(area(uni(sq10, sq10)) === 100.0)
    assert(isEmpty(diff(sq10, sq10)))
    assert(isEmpty(xor(sq10, sq10)))
  }

  test("containment: inner square subtracts to a donut, symdiff too") {
    val innerSq = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"
    val d = diff(sq10, innerSq)
    assert(area(d) === 64.0)
    d match {
      case GPolygon(rings) => assert(rings.length === 2)
      case other => fail(s"expected holed POLYGON, got ${GeoFunctions.print(other)}")
    }
    assert(area(xor(sq10, innerSq)) === 64.0)
    // difference the other way: inner minus outer is empty
    assert(isEmpty(diff(innerSq, sq10)))
    assert(geomEquals(inter(sq10, innerSq), p(innerSq)).contains(true))
  }

  test("multipolygon operand: union with a bridging rectangle fuses components") {
    val two = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((6 0, 10 0, 10 4, 6 4, 6 0)))"
    val bridge = "POLYGON ((3 1, 7 1, 7 3, 3 3, 3 1))"
    val fused = GeoOverlay.overlayAreal(Vector(p(two), p(bridge)), m => m(0) || m(1))
    assert(area(fused) === (16 + 16 + 8 - 2 - 2).toDouble)
    fused match {
      case _: GPolygon => ()
      case other => fail(s"expected one fused POLYGON, got ${GeoFunctions.print(other)}")
    }
  }

  test("vertex-on-edge and collinear-edge degeneracies stay consistent") {
    // diamond whose left vertex lies ON the square's right edge
    val diamond = "POLYGON ((10 5, 15 0, 20 5, 15 10, 10 5))"
    assert(GeoFunctions.print(inter(sq10, diamond)) === "POINT (10 5)")
    assert(area(uni(sq10, diamond)) === 150.0)
    // partial collinear overlap of edges: [10,0..10,4] shared
    val off = "POLYGON ((10 0, 20 0, 20 4, 10 4, 10 0))"
    assert(GeoFunctions.print(inter(sq10, off)) === "LINESTRING (10 0, 10 4)")
    assert(area(uni(sq10, off)) === 140.0)
  }

  test("lineal intersection: crossing, overlap, and polygon clipping") {
    val cross = GeoOverlay.intersectionLineal(
      p("LINESTRING (0 0, 10 10)"), p("LINESTRING (0 10, 10 0)"))
    assert(GeoFunctions.print(cross) === "POINT (5 5)", GeoFunctions.print(cross))
    val overlap = GeoOverlay.intersectionLineal(
      p("LINESTRING (0 0, 10 0)"), p("LINESTRING (4 0, 20 0)"))
    assert(GeoFunctions.print(overlap) === "LINESTRING (4 0, 10 0)")
    // line through the square: keep the inside run
    val clipped = GeoOverlay.intersectionLineal(
      p("LINESTRING (-5 5, 15 5)"), p(sq10))
    assert(GeoFunctions.print(clipped) === "LINESTRING (0 5, 10 5)")
    // difference: keep the outside runs
    val outside = GeoOverlay.differenceLineal(p("LINESTRING (-5 5, 15 5)"), p(sq10))
    outside match {
      case GMultiLineString(ls) => assert(ls.map(_.toSet).toSet ===
        Set(Set(Pt(-5, 5), Pt(0, 5)), Set(Pt(10, 5), Pt(15, 5))))
      case other => fail(s"expected MULTILINESTRING, got ${GeoFunctions.print(other)}")
    }
    // line crossing another: difference keeps the whole line (0D removal)
    val whole = GeoOverlay.differenceLineal(
      p("LINESTRING (0 0, 10 10)"), p("LINESTRING (0 10, 10 0)"))
    assert(length(whole) === length(p("LINESTRING (0 0, 10 10)")))
  }

  test("mixed union: uncovered line rides along, covered line is absorbed") {
    val across = GeoOverlay.unionMixed(p("LINESTRING (5 5, 15 5)"), p(sq10))
    across match {
      case GCollection(parts) =>
        assert(parts.length === 2)
        assert(area(across) === 100.0)
        assert(GeoFunctions.print(parts(1)) === "LINESTRING (10 5, 15 5)")
      case other => fail(s"expected GEOMETRYCOLLECTION, got ${GeoFunctions.print(other)}")
    }
    val inside = GeoOverlay.unionMixed(p("LINESTRING (2 2, 8 8)"), p(sq10))
    assert(geomEquals(inside, p(sq10)).contains(true))
    // Boundary-covered linework is absorbed too — the reference's own
    // expectation (TestGeoFunctions.java:987): LINESTRING (1 1, 4 1)
    // along the bottom edge of POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))
    // survives only as the uncovered LINESTRING (3 1, 4 1).
    val onEdge = GeoOverlay.unionMixed(
      p("LINESTRING (1 1, 4 1)"), p("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
    onEdge match {
      case GCollection(parts) =>
        assert(parts.length === 2)
        assert(GeoFunctions.print(parts(1)) === "LINESTRING (3 1, 4 1)")
      case other => fail(s"expected GEOMETRYCOLLECTION, got ${GeoFunctions.print(other)}")
    }
  }

  test("DE-9IM full matrices match the published values") {
    // overlapping polygons (classic OGC example)
    assert(GeoOverlay.de9imFull(
      p(sq10), p("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")) === "212101212")
    // equal polygons
    assert(GeoOverlay.de9imFull(p(sq10), p(sq10)) === "2FFF1FFF2")
    // touching along an edge
    assert(GeoOverlay.de9imFull(
      p(sq10), p("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")) === "FF2F11212")
    // disjoint
    assert(GeoOverlay.de9imFull(
      p(sq10), p("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")) === "FF2FF1212")
    // contained with no boundary contact
    assert(GeoOverlay.de9imFull(
      p("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"), p(sq10)) === "2FF1FF212")
    // line crossing a polygon (endpoints outside)
    assert(GeoOverlay.de9imFull(
      p("LINESTRING (-5 5, 15 5)"), p(sq10)) === "101FF0212")
    // crossing lines
    assert(GeoOverlay.de9imFull(
      p("LINESTRING (0 0, 10 10)"), p("LINESTRING (0 10, 10 0)")) === "0F1FF0102")
    // overlapping collinear lines
    assert(GeoOverlay.de9imFull(
      p("LINESTRING (0 0, 10 0)"), p("LINESTRING (4 0, 20 0)")) === "1010F0102")
  }

  test("general buffer: line and polygon buffers have the Minkowski area") {
    val line = p("LINESTRING (0 0, 10 0)")
    val buf = GeoOverlay.bufferGeneral(line, 2.0)
    // rectangle 10x4 plus two half-disk caps approximated by 32-gons
    val capArea = 0.5 * 32 * math.sin(2 * math.Pi / 32) * 4 // full 32-gon area r=2
    val expected = 40.0 + capArea
    assert(math.abs(area(buf) - expected) < 0.35, s"got ${area(buf)} want ~$expected")
    // buffer contains the line's vertices strictly
    assert(GeoFunctions.contains(buf,
      GMultiPoint(vertices(line))).contains(true))
    val poly = GeoOverlay.bufferGeneral(p(sq10), 1.0)
    // 100 + perimeter*1 + pi -> with 32-gon corner approximation
    assert(math.abs(area(poly) - (100 + 40 + math.Pi)) < 0.25, s"got ${area(poly)}")
    assert(GeoFunctions.contains(poly,
      GMultiPoint(vertices(p(sq10)))).contains(true))
    poly match {
      case GPolygon(rings) => assert(rings.length === 1)
      case other => fail(s"expected POLYGON, got ${GeoFunctions.print(other)}")
    }
  }

  test("overlay identities hold over 200 random polygon pairs") {
    // inclusion-exclusion and partition identities are engine-independent
    // ground truth: for ANY pair, area(A∩B) + area(A∪B) = area(A) + area(B),
    // the three regions A\B, B\A, A∩B partition the union, and the
    // symmetric difference is the union minus the intersection. Random
    // convex polygons (hulls of random points, integer coords so shared
    // vertices/edges occur often) sweep degenerate contacts a curated
    // list would miss.
    val rnd = new scala.util.Random(20260814)
    def randPoly(): Geom = {
      val pts = Vector.fill(3 + rnd.nextInt(8))(
        Pt(rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble))
      GeoFunctions.convexHull(GMultiPoint(pts)) match {
        case poly: GPolygon => poly
        case _ => randPoly() // degenerate (collinear) sample — redraw
      }
    }
    var checked = 0
    while (checked < 200) {
      val a = randPoly(); val b = randPoly()
      val wa = GeoFunctions.print(a); val wb = GeoFunctions.print(b)
      val clue = s"A=$wa B=$wb"
      val ai = area(a); val bi = area(b)
      val inter = area(GeoOverlay.overlayAreal(Vector(a, b), m => m(0) && m(1)))
      val uni = area(GeoOverlay.overlayAreal(Vector(a, b), m => m(0) || m(1)))
      val dAB = area(GeoOverlay.overlayAreal(Vector(a, b), m => m(0) && !m(1)))
      val dBA = area(GeoOverlay.overlayAreal(Vector(a, b), m => !m(0) && m(1)))
      val sym = area(GeoOverlay.overlayAreal(Vector(a, b), m => m(0) ^ m(1)))
      val eps = 1e-6 * (1 + ai + bi)
      assert(math.abs(inter + uni - ai - bi) < eps, s"incl-excl: $clue")
      assert(math.abs(dAB + dBA + inter - uni) < eps, s"partition: $clue")
      assert(math.abs(sym - (uni - inter)) < eps, s"symdiff: $clue")
      assert(inter >= -eps && inter <= math.min(ai, bi) + eps, s"bounds: $clue")
      checked += 1
    }
  }

  test("rectilinear torture: overlay areas match an independent cell count") {
    // ground truth that does NOT come from the overlay: with
    // integer-aligned rectangles, membership of each unit cell's center
    // decides the exact area by counting — so heavy collinear-edge /
    // shared-corner degeneracy (the worst case for clipping algorithms)
    // is checked against an independent derivation.
    val rnd = new scala.util.Random(777)
    def randRect(): (Int, Int, Int, Int) = {
      val x0 = rnd.nextInt(12); val y0 = rnd.nextInt(12)
      (x0, y0, x0 + 1 + rnd.nextInt(6), y0 + 1 + rnd.nextInt(6))
    }
    def rectGeom(r: (Int, Int, Int, Int)): Geom = {
      val (x0, y0, x1, y1) = r
      GPolygon(Vector(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0))))
    }
    def inRect(cx: Double, cy: Double, r: (Int, Int, Int, Int)): Boolean =
      cx > r._1 && cx < r._3 && cy > r._2 && cy < r._4
    (1 to 40).foreach { _ =>
      val as = Vector.fill(2 + rnd.nextInt(3))(randRect())
      val bs = Vector.fill(2 + rnd.nextInt(3))(randRect())
      val aG = GeoOverlay.overlayAreal(as.map(rectGeom), m => m.exists(identity))
      val bG = GeoOverlay.overlayAreal(bs.map(rectGeom), m => m.exists(identity))
      def cellCount(pred: (Double, Double) => Boolean): Int =
        (for (cx <- 0 until 20; cy <- 0 until 20
              if pred(cx + 0.5, cy + 0.5)) yield 1).sum
      val inA = (cx: Double, cy: Double) => as.exists(inRect(cx, cy, _))
      val inB = (cx: Double, cy: Double) => bs.exists(inRect(cx, cy, _))
      val clue = s"A=${as.mkString(";")} B=${bs.mkString(";")}"
      assert(area(aG) === cellCount(inA).toDouble, s"union(A): $clue")
      assert(area(bG) === cellCount(inB).toDouble, s"union(B): $clue")
      assert(area(GeoOverlay.overlayAreal(Vector(aG, bG), m => m(0) && m(1))) ===
        cellCount((x, y) => inA(x, y) && inB(x, y)).toDouble, s"inter: $clue")
      assert(area(GeoOverlay.overlayAreal(Vector(aG, bG), m => m(0) && !m(1))) ===
        cellCount((x, y) => inA(x, y) && !inB(x, y)).toDouble, s"diff: $clue")
      assert(area(GeoOverlay.overlayAreal(Vector(aG, bG), m => m(0) ^ m(1))) ===
        cellCount((x, y) => inA(x, y) ^ inB(x, y)).toDouble, s"xor: $clue")
    }
  }

  test("union of two C-shapes pinches a hole closed") {
    // two interlocking C's whose arms close a square courtyard: the
    // union must carry the courtyard as a HOLE, which only appears when
    // the boundary trace resolves the pinch vertices correctly
    val left = "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))"
    val right = "POLYGON ((8 2, 10 2, 10 8, 8 8, 8 2))"
    val uni = GeoOverlay.overlayAreal(Vector(p(left), p(right)), m => m(0) || m(1))
    uni match {
      case GPolygon(rings) =>
        assert(rings.length === 2, s"expected a hole: ${GeoFunctions.print(uni)}")
      case other => fail(s"expected holed POLYGON, got ${GeoFunctions.print(other)}")
    }
    // area: C (100 - 6x8 notch + ... compute: outer 10x10=100 minus the
    // notch x in [2,10), y in (2,8) => 48 → C = 52; right bar adds 2x6=12
    // of which nothing overlaps C (bar spans x in [8,10] y in [2,8] —
    // inside the notch) → union 64, courtyard hole = (2..8)x(2..8) area 36
    assert(area(uni) === 64.0, GeoFunctions.print(uni))
  }

  test("DE-9IM with holes: the hole ring is boundary, the courtyard exterior") {
    val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    // plug strictly inside the HOLE: disjoint (courtyard is exterior)
    assert(GeoOverlay.de9imFull(
      p(donut), p("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")) === "FF2FF1212")
    // plug filling the hole exactly: meets along the hole RING — the
    // plug's whole boundary coincides with donut boundary, so E(donut)
    // never touches B(plug)
    assert(GeoOverlay.de9imFull(
      p(donut), p("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")) === "FF2F112F2")
    // probe crossing from the courtyard through the annulus to outside
    assert(GeoOverlay.de9imFull(
      p("LINESTRING (5 5, 15 5)"), p(donut)) === "101FF0212")
  }

  test("orientation predicate: filtered sign agrees with exact arithmetic " +
      "under 1e-12-scale perturbations") {
    // Near-collinear triples where the naive double determinant's sign
    // flips with evaluation noise: b sits on the line o->a nudged by a
    // sub-rounding-error amount. The exact (BigDecimal) determinant is
    // the ground truth; the filtered orient must agree on EVERY case.
    val rnd = new scala.util.Random(20260814)
    def jbd(d: Double) = new java.math.BigDecimal(d) // exact binary value
    def exactSign(o: Pt, a: Pt, b: Pt): Int =
      jbd(a.x).subtract(jbd(o.x)).multiply(jbd(b.y).subtract(jbd(o.y)))
        .subtract(jbd(a.y).subtract(jbd(o.y)).multiply(jbd(b.x).subtract(jbd(o.x))))
        .signum
    var exercisedBand = 0
    for (_ <- 1 to 50000) {
      val o = Pt(rnd.nextDouble() * 24, rnd.nextDouble() * 24)
      val a = Pt(o.x + rnd.nextDouble() * 12, o.y + rnd.nextDouble() * 12)
      val t = rnd.nextDouble() * 2
      val nudge = (rnd.nextInt(7) - 3) * 1e-12 * rnd.nextDouble()
      val b = Pt(o.x + t * (a.x - o.x) + nudge, o.y + t * (a.y - o.y) - nudge)
      val es = exactSign(o, a, b)
      val fs = math.signum(GeoOverlay.orient(o, a, b)).toInt
      assert(fs === es,
        s"filtered=$fs exact=$es for o=$o a=$a b=$b")
      // count the cases where the NAIVE determinant disagrees with the
      // exact sign — proof the test exercises the uncertainty band
      val naive = (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
      if (math.signum(naive).toInt != es) exercisedBand += 1
    }
    assert(exercisedBand > 0,
      "perturbations never produced a naive-sign error — test is vacuous")
  }

  test("overlay of near-degenerate sliver polygons stays consistent") {
    // two rectangles sharing an edge nudged by 1e-12: the union must be
    // a single polygon of (close to) the combined area, not a sliver
    // explosion from inconsistent orientation tests
    val a = "POLYGON ((0 0, 10 0, 10 5, 0 5, 0 0))"
    val b = "POLYGON ((0 5.000000000001, 10 5, 10 10, 0 10, 0 5.000000000001))"
    val uni = GeoOverlay.overlayAreal(
      Vector(p(a), p(b)), m => m(0) || m(1))
    assert(math.abs(area(uni) - 100.0) < 1e-6, GeoFunctions.print(uni))
    val inter = GeoOverlay.overlayAreal(
      Vector(p(a), p(b)), m => m(0) && m(1))
    assert(area(inter) < 1e-6, GeoFunctions.print(inter))
  }

  test("buffer of a closed ring polyline rounds a frame") {
    val l = p("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)")
    val buf = GeoOverlay.bufferGeneral(l, 1.0)
    buf match {
      // frame: outer rounded square with an 8x8 hole
      case GPolygon(rings) => assert(rings.length === 2, GeoFunctions.print(buf))
      case other => fail(s"expected holed POLYGON, got ${GeoFunctions.print(other)}")
    }
    assert(math.abs(area(buf) - (2 * 40 + math.Pi - 4 * 1)) < 1.2, s"got ${area(buf)}")
  }
}
