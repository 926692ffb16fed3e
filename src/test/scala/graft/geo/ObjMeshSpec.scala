package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Wavefront OBJ ingestion for the ray-mesh family (VERDICT r10 #5):
  * a checked-in OBJ fixture of the synthetic building loads through
  * [[TriMesh.fromObj]] into a mesh triangle-for-triangle identical to
  * the in-code [[graft.pipeline.RayMesh.syntheticBuilding]], so the
  * q86/q94 semantics hold unchanged over a mesh read from disk — the
  * reference's `pv.read` shape (hg/helpers/MeshWallExtractror.py:36).
  */
class ObjMeshSpec extends AnyFunSuite {

  private def fixtureLines: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/building_8walls.obj")
    assert(in != null, "missing building_8walls.obj test resource")
    try scala.io.Source.fromInputStream(in).getLines().toSeq finally in.close()
  }

  test("q105's generated box OBJ parses to 12 triangles matching the closed forms") {
    for (k <- Seq(1L, 7L, 123L)) {
      val t = TriMesh.fromObj(graft.queries.MeshIngest.objText(k))
      assert(t.length == 12 * 9, s"mesh $k: ${t.length / 9} triangles")
      val w = 2.0 + (k * 7 % 50) / 10.0
      val h = 3.0 + (k * 11 % 40) / 10.0
      val d = 1.0 + (k * 13 % 30) / 10.0
      var area = 0.0
      for (i <- 0 until 12) {
        val o = i * 9
        val e1 = Array(t(o + 3) - t(o), t(o + 4) - t(o + 1), t(o + 5) - t(o + 2))
        val e2 = Array(t(o + 6) - t(o), t(o + 7) - t(o + 1), t(o + 8) - t(o + 2))
        val cx = e1(1) * e2(2) - e1(2) * e2(1)
        val cy = e1(2) * e2(0) - e1(0) * e2(2)
        val cz = e1(0) * e2(1) - e1(1) * e2(0)
        area += math.sqrt(cx * cx + cy * cy + cz * cz) / 2.0
      }
      assert(math.abs(area - 2 * (w * h + w * d + h * d)) < 1e-9,
        s"mesh $k: surface area $area vs ${2 * (w * h + w * d + h * d)}")
    }
  }

  test("tab-delimited geometry lines parse identically to space-delimited") {
    val spaced = Seq("v 0 0 0", "v 1 0 0", "v 0 1 0", "f 1 2 3")
    val tabbed = Seq("v\t0\t0\t0", "v\t1\t0\t0", "v\t0\t1\t0", "f\t1\t2\t3")
    assert(TriMesh.fromObj(tabbed).sameElements(TriMesh.fromObj(spaced)),
      "exporters emit tabs; a prefix test would silently drop all geometry")
    assert(TriMesh.fromObj(spaced).length == 9)
  }

  test("OBJ fixture parses to the synthetic building's exact triangle soup") {
    val soup = TriMesh.fromObj(fixtureLines)
    val want = graft.pipeline.RayMesh.syntheticBuilding().tris
    assert(soup.length == want.length, s"${soup.length} vs ${want.length} doubles")
    assert(soup.sameElements(want),
      "quad fan-triangulation must reproduce wallQuad's two triangles per wall")
  }

  test("OBJ-loaded mesh answers first-hit queries identically to the in-code mesh") {
    val fromObj = TriMesh.build(TriMesh.fromObj(fixtureLines))
    val inCode = graft.pipeline.RayMesh.syntheticBuilding()
    val rays = Seq(
      (100.0, -100.0, 100.0, 0.0, -1.0, 0.0),  // straight at the near wall
      (100.0, -100.0, 100.0, 1.0, 0.3, 0.1),   // oblique
      (0.0, 0.0, 100.0, 0.0, 0.0, 1.0),        // up: only the far shell... or miss
      (300.0, -200.0, 50.0, -0.7, 0.7, -0.05))
    for ((ox, oy, oz, dx, dy, dz) <- rays) {
      val a = fromObj.firstHit(ox, oy, oz, dx, dy, dz)
      val b = inCode.firstHit(ox, oy, oz, dx, dy, dz)
      assert(a == b, s"ray ($ox,$oy,$oz)->($dx,$dy,$dz): $a vs $b")
    }
    assert(rays.exists { case (ox, oy, oz, dx, dy, dz) =>
      fromObj.firstHit(ox, oy, oz, dx, dy, dz).isDefined
    }, "at least one probe ray must hit")
  }

  test("face references: v/vt, v//vn, v/vt/vn and negative indices all resolve") {
    val obj = Seq(
      "# tetra-ish fan with every reference style",
      "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
      "vt 0 0", "vn 0 0 1",
      "f 1/1 2/1/1 3//1 4/1/1") // quad → 2 triangles
    val soup = TriMesh.fromObj(obj)
    assert(soup.length == 18)
    assert(soup.take(9).sameElements(Array[Double](0, 0, 0, 1, 0, 0, 1, 1, 0)))
    assert(soup.drop(9).sameElements(Array[Double](0, 0, 0, 1, 1, 0, 0, 1, 0)))
    val neg = TriMesh.fromObj(Seq("v 0 0 0", "v 1 0 0", "v 0 1 0", "f -3 -2 -1"))
    assert(neg.sameElements(Array[Double](0, 0, 0, 1, 0, 0, 0, 1, 0)))
  }

  test("non-geometry lines are skipped; malformed geometry throws") {
    val ok = TriMesh.fromObj(Seq(
      "mtllib walls.mtl", "o building", "g wall0", "s off", "usemtl concrete",
      "v 0 0 0", "v 1 0 0", "v 0 1 0", "vp 0.5", "f 1 2 3"))
    assert(ok.length == 9)
    intercept[IllegalArgumentException](TriMesh.fromObj(Seq("v 1 2")))
    intercept[IllegalArgumentException](TriMesh.fromObj(Seq("v 0 0 0", "f 1 2")))
    intercept[IllegalArgumentException](TriMesh.fromObj(Seq("v 0 0 0", "f 0 1 1")))
    intercept[IllegalArgumentException](TriMesh.fromObj(Seq("v 0 0 0", "f 1 2 5")))
    intercept[NumberFormatException](TriMesh.fromObj(Seq("v a b c")))
  }
}
