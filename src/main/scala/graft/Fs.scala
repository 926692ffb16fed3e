package graft

/** Local-filesystem helpers shared by the state/stage committers
  * (IngestDeduper segments, Dag stage tables). One definition: deletion
  * ORDER is load-bearing (see [[uncommitThenDelete]]) and must not fork
  * across call sites.
  */
private[graft] object Fs {

  def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rmTree); f.delete(): Unit
  }

  /** Delete a COMMITTED table dir safely: drop its commit markers FIRST,
    * then the data. `rmTree` alone deletes children in arbitrary
    * listFiles order, so a crash mid-delete could leave the marker
    * present with data files already gone — a torn table that would
    * pass the next tick's commit gate. Marker-first means any crash
    * leaves an UNcommitted dir, which readers ignore and writers
    * rebuild.
    */
  def uncommitThenDelete(dir: java.io.File, markers: Seq[String]): Unit = {
    markers.foreach(m => new java.io.File(dir, m).delete(): Unit)
    rmTree(dir)
  }
}
