package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot diff — the added/removed/changed/unchanged census over the
  * two deterministic derived snapshots. */
class SnapshotDiffSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("statuses partition the id universe; classes match the snapshot definitions") {
    val docs = graft.Tables.table(spark, sf, "documents")
    val d = SnapshotDiff.diff(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val byStatus = d.groupBy(_._1._1).view.mapValues(_.values.sum).toMap

    val o = SnapshotDiff.oldSnapshot(docs).count()
    val n = SnapshotDiff.newSnapshot(docs).count()
    // added = NEW ∖ OLD, removed = OLD ∖ NEW; both snapshots are id
    // subsets of the corpus, so the counts must reconcile exactly
    assert(byStatus.values.sum ==
      byStatus.getOrElse("added", 0L) + o,
      "every old doc + every added doc appears exactly once")
    assert(byStatus.getOrElse("removed", 0L) == o + byStatus.getOrElse("added", 0L) - n)

    // every changed doc is in the overlap and carries the edit bucket
    val changed = SnapshotDiff.diff(docs)
      .filter(col("status") === "changed").agg(sum("n_docs")).collect()(0).getLong(0)
    val editExpected = docs.select(Sampling.bucket(col("doc_id")).as("b"))
      .filter(col("b") >= SnapshotDiff.RemovedBp &&
        col("b") < SnapshotDiff.AddedBp &&
        col("b") % SnapshotDiff.EditMod === SnapshotDiff.EditRem)
      .count()
    assert(changed == editExpected)

    // deterministic
    val d2 = SnapshotDiff.diff(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(d == d2)
  }

  test("registered query/oracle pair exists") {
    assert(graft.SparkEntry.queries.contains("corpus_diff"))
    assert(graft.SparkEntry.oracleSql.contains("corpus_diff"))
  }
}
