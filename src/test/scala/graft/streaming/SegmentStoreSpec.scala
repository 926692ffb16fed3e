package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Direct SegmentStore cases not reachable through the dedupers' specs:
  * the in-process retry window where a prior attempt stamped the tmp
  * marker but failed before (or during) the rename. No Spark involved —
  * the store is pure file management.
  */
class SegmentStoreSpec extends AnyFunSuite {

  private def withStore(f: (SegmentStore, java.io.File) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("segstore-spec").toFile
    try f(new SegmentStore(Some(dir.toString)), dir)
    finally graft.Fs.rmTree(dir)
  }

  test("rehydration sweeps a marker-less torn-retire segment instead of retaining it") {
    val dir = java.nio.file.Files.createTempDirectory("segstore-spec").toFile
    try {
      // Simulate retire() crashing mid-delete: markers already gone,
      // data still on disk. Rehydration must sweep it (it can never be
      // read — uncommitted), not retain it as an anonymous leak.
      val torn = new java.io.File(dir, "b5_3")
      new java.io.File(torn, "sh").mkdirs()
      java.nio.file.Files.writeString(torn.toPath.resolve("sh/part-0"), "rows")
      // A committed sibling with the marker must survive.
      val live = new java.io.File(dir, "b1_1")
      live.mkdirs()
      java.nio.file.Files.writeString(live.toPath.resolve("_graft_commit"), "")
      // A foreign directory that merely LOOKS unrelated must survive too.
      val foreign = new java.io.File(dir, "not_a_segment")
      foreign.mkdirs()
      val store = new SegmentStore(Some(dir.toString))
      assert(!torn.exists(), "torn retire must be swept at rehydration")
      assert(live.exists(), "committed segment must survive")
      assert(foreign.exists(), "foreign dirs are never touched")
      assert(store.segmentCount == 1)
    } finally graft.Fs.rmTree(dir)
  }

  test("commitBatch self-heals a stale stamped tmp from a failed prior attempt") {
    withStore { (store, root) =>
      // Simulate: attempt 1 wrote subdirs, stamped the marker, then the
      // rename failed (commitSeq never advanced). The retry reuses
      // t0.tmp; a subdir-layout write only replaces its own subdirs, so
      // without the root clear the re-stamp would throw
      // FileAlreadyExistsException and wedge the stream.
      val tmp = new java.io.File(root, "t0.tmp")
      new java.io.File(tmp, "stale_sub").mkdirs()
      java.nio.file.Files.writeString(tmp.toPath.resolve("_graft_commit"), "")
      val dir = store.commitBatch(0L) { t =>
        val sub = new java.io.File(t, "sh"); sub.mkdirs()
        java.nio.file.Files.writeString(sub.toPath.resolve("part-0"), "rows")
      }
      val seg = new java.io.File(dir)
      assert(seg.getName == "b0_0")
      assert(new java.io.File(seg, "_graft_commit").exists())
      assert(new java.io.File(seg, "sh/part-0").exists())
      assert(!new java.io.File(seg, "stale_sub").exists(),
        "stale attempt contents must not leak into the committed segment")
      assert(store.segmentCount == 1)
    }
  }

  test("compactExcept self-heals a stale tmp the same way") {
    withStore { (store, root) =>
      def write(label: String)(t: String): Unit = {
        new java.io.File(t).mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(t, label), "")
      }
      store.commitBatch(0L)(write("a"))
      store.commitBatch(1L)(write("b"))
      // Stale stamped tmp at the NEXT seq (t2.tmp) — as left by a
      // compaction attempt that failed at the rename.
      val tmp = new java.io.File(root, "t2.tmp")
      tmp.mkdirs()
      java.nio.file.Files.writeString(tmp.toPath.resolve("_graft_commit"), "")
      store.compactExcept(None)(
        (olds, t) => { assert(olds.size == 2); write("folded")(t) })
      assert(store.segmentCount == 1)
      val base = root.listFiles().filter(_.getName.startsWith("base_")).head
      assert(new java.io.File(base, "folded").exists())
    }
  }
}
