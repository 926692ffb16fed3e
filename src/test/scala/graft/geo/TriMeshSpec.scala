package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class TriMeshSpec extends AnyFunSuite {

  /** Brute-force reference: nearest Möller–Trumbore hit over ALL
    * triangles, written independently of the BVH traversal.
    */
  private def bruteFirstHit(tris: Array[Double], o: (Double, Double, Double),
      d: (Double, Double, Double)): Option[(Double, Double, Double)] = {
    var best = Double.PositiveInfinity
    for (t <- 0 until tris.length / 9) {
      val b = t * 9
      val (ax, ay, az) = (tris(b), tris(b + 1), tris(b + 2))
      val e1 = (tris(b + 3) - ax, tris(b + 4) - ay, tris(b + 5) - az)
      val e2 = (tris(b + 6) - ax, tris(b + 7) - ay, tris(b + 8) - az)
      val p = (d._2 * e2._3 - d._3 * e2._2, d._3 * e2._1 - d._1 * e2._3, d._1 * e2._2 - d._2 * e2._1)
      val det = e1._1 * p._1 + e1._2 * p._2 + e1._3 * p._3
      if (math.abs(det) >= 1e-12) {
        val inv = 1.0 / det
        val tv = (o._1 - ax, o._2 - ay, o._3 - az)
        val u = (tv._1 * p._1 + tv._2 * p._2 + tv._3 * p._3) * inv
        if (u >= 0 && u <= 1) {
          val q = (tv._2 * e1._3 - tv._3 * e1._2, tv._3 * e1._1 - tv._1 * e1._3, tv._1 * e1._2 - tv._2 * e1._1)
          val v = (d._1 * q._1 + d._2 * q._2 + d._3 * q._3) * inv
          if (v >= 0 && u + v <= 1) {
            val tt = (e2._1 * q._1 + e2._2 * q._2 + e2._3 * q._3) * inv
            if (tt > 1e-9 && tt < best) best = tt
          }
        }
      }
    }
    if (best.isInfinite) None
    else Some((o._1 + best * d._1, o._2 + best * d._2, o._3 + best * d._3))
  }

  test("straight-on hit lands on the wall plane") {
    val mesh = TriMesh.build(TriMesh.wallQuad(-10, 5, 10, 5, 0, 10))
    val hit = mesh.firstHit(0, 0, 5, 0, 1, 0)
    assert(hit.isDefined)
    val (px, py, pz, t) = hit.get
    assert(math.abs(py - 5.0) <= 1e-12 && math.abs(px) <= 1e-12 && math.abs(pz - 5) <= 1e-12)
    assert(math.abs(t - 5.0) <= 1e-12)
  }

  test("miss returns None; nearest of two walls wins") {
    val two = TriMesh.build(
      TriMesh.wallQuad(-10, 5, 10, 5, 0, 10) ++ TriMesh.wallQuad(-10, 3, 10, 3, 0, 10))
    assert(two.firstHit(0, 0, 5, 0, -1, 0).isEmpty)
    val (_, py, _, _) = two.firstHit(0, 0, 5, 0, 1, 0).get
    assert(math.abs(py - 3.0) <= 1e-12, "nearer wall (y=3) wins")
  }

  test("BVH agrees with brute force on 500 random rays over a 200-wall city") {
    val rng = new scala.util.Random(11)
    val tris = (0 until 200).flatMap { _ =>
      val x = rng.nextDouble() * 1000 - 500; val y = rng.nextDouble() * 1000 - 500
      val len = 20 + rng.nextDouble() * 80
      val horiz = rng.nextBoolean()
      if (horiz) TriMesh.wallQuad(x, y, x + len, y, 0, 30 + rng.nextDouble() * 40)
      else TriMesh.wallQuad(x, y, x, y + len, 0, 30 + rng.nextDouble() * 40)
    }.toArray
    val mesh = TriMesh.build(tris)
    var hits = 0
    (0 until 500).foreach { _ =>
      val o = (rng.nextDouble() * 800 - 400, rng.nextDouble() * 800 - 400, rng.nextDouble() * 50)
      val d = (rng.nextDouble() * 2 - 1, rng.nextDouble() * 2 - 1, rng.nextDouble() * 0.4 - 0.2)
      val got = mesh.firstHit(o._1, o._2, o._3, d._1, d._2, d._3)
      val want = bruteFirstHit(tris, o, d)
      assert(got.isDefined == want.isDefined, s"hit parity for $o $d")
      (got, want) match {
        case (Some((gx, gy, gz, _)), Some((wx, wy, wz))) =>
          assert(math.abs(gx - wx) <= 1e-9 && math.abs(gy - wy) <= 1e-9 && math.abs(gz - wz) <= 1e-9)
          hits += 1
        case _ =>
      }
    }
    assert(hits > 50, s"fixture produced $hits hits — too sparse to be meaningful")
  }

  test("empty mesh never hits") {
    assert(TriMesh.build(Array.empty[Double]).firstHit(0, 0, 0, 1, 0, 0).isEmpty)
  }
}
