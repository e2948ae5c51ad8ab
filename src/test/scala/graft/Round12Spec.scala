package graft

import org.apache.spark.sql.functions._

/** Round-12 pins: SnapshotTable time travel (readAt/versions), the
  * post-compaction hash-sidecar invariant, the staging-orphan janitor,
  * and the bucketed fact-fact join registry row.
  */
class Round12Spec extends SparkSpec {

  // ---- time travel: readAt(version) / versions() ------------------------

  test("readAt pins an old snapshot; later ingests never disturb it") {
    import spark.implicits._
    import graft.operators.SnapshotTable
    val path = java.nio.file.Files.createTempDirectory("graft-timetravel").toString
    SnapshotTable.ingest(spark, Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      path, "text", 100L)
    SnapshotTable.ingest(spark, Seq((3L, "gamma")).toDF("doc_id", "text"),
      path, "text", 100L)
    assert(SnapshotTable.versions(spark, path) == Seq(1L, 2L))
    // Resolve v1 BEFORE more commits land: the returned frame is pinned
    // to v1's immutable files, so commits racing the read can't shift it.
    val pinned = SnapshotTable.readAt(spark, path, 1L)
    SnapshotTable.ingest(spark, Seq((4L, "delta")).toDF("doc_id", "text"),
      path, "text", 100L)
    assert(SnapshotTable.versions(spark, path) == Seq(1L, 2L, 3L))
    assert(pinned.collect().map(_.getString(1)).toSet == Set("alpha", "beta"),
      "a frame resolved at v1 must still read exactly v1 after later commits")
    // Re-resolving after the commits sees the same v1 (manifests are
    // immutable), and each version reads its own prefix of the chain.
    assert(SnapshotTable.readAt(spark, path, 1L).count() == 2L)
    assert(SnapshotTable.readAt(spark, path, 2L).count() == 3L)
    assert(SnapshotTable.readAt(spark, path, 3L).count() == 4L)
    assert(SnapshotTable.read(spark, path).count() == 4L, "read() = readAt(current)")
  }

  test("readAt of an expired or never-committed version fails loudly") {
    import spark.implicits._
    import graft.operators.SnapshotTable
    val path = java.nio.file.Files.createTempDirectory("graft-tt-expired").toString
    SnapshotTable.write(spark, Seq((1L, "a")).toDF("doc_id", "text"), path)
    SnapshotTable.write(spark, Seq((2L, "b")).toDF("doc_id", "text"), path)
    SnapshotTable.write(spark, Seq((3L, "c")).toDF("doc_id", "text"), path)
    assert(SnapshotTable.expire(spark, path, keep = 2) == 1)
    assert(SnapshotTable.versions(spark, path) == Seq(2L, 3L))
    val e1 = intercept[IllegalArgumentException](SnapshotTable.readAt(spark, path, 1L))
    assert(e1.getMessage.contains("retained versions: 2..3"),
      s"expired-version error must name the retained range: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException](SnapshotTable.readAt(spark, path, 99L))
    assert(e2.getMessage.contains("not committed"))
    // a silent fallback to current would have returned rows here
    assert(SnapshotTable.readAt(spark, path, 2L).collect().map(_.getString(1)).toSeq == Seq("b"))
  }

  test("d11 registry row diffs two REAL committed versions via readAt") {
    // The table format's flagship consumer: the d11 fixture must be an
    // actual two-commit SnapshotTable, not a same-plan synthesis.
    val reg = SparkEntry.queries("d11_snapshot_diff")(spark, sfDir)
    val rows = reg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import graft.operators.SnapshotTable
    val fixture = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft-d11-" + Integer.toHexString(sfDir.hashCode)).toString
    assert(SnapshotTable.versions(spark, fixture) == Seq(1L, 2L),
      "d11 must have staged a real two-version snapshot table")
    val n1 = SnapshotTable.readAt(spark, fixture, 1L).count()
    val n2 = SnapshotTable.readAt(spark, fixture, 2L).count()
    assert(rows("removed") == n1 - n2, "diff counts must reconcile with the commits")
    assert(rows.getOrElse("added", 0L) == 0L)
    assert(rows("changed") + rows("unchanged") == n2)
  }
}
