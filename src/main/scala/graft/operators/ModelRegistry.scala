package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist fitted models as VERSIONED parquet tables — the publication
  * step that makes train-offline/serve-online real. Every streaming
  * scorer in the library (quality verdicts, the admission cut, novelty
  * seeds) serves model constants as plan literals; in production those
  * constants come from a table a batch job PUBLISHED — with versions,
  * so a bad fit rolls back and an audit can replay exactly what served
  * when — not from a JVM object that dies with the driver.
  *
  * Storage shape: one (param, idx, value) long row per model scalar —
  * schema-stable across model evolution, engine-portable (any SQL
  * reader can audit a published model), and trivially mergeable. The
  * table rides [[VersionedTable]], so publish = overwrite (a new
  * version), rollback = readAt, retention = the table's own policy.
  *
  * Reference anchor: the reference persists nothing but data
  * (`/root/reference/src/utils/bucket.py` writes tables only); model
  * publication is the missing operational half of the quality tier
  * this library adds.
  */
object ModelRegistry {

  /** A fitted logistic quality filter as registry rows:
    * ("mean", j, ·) / ("sd", j, ·) for each feature, ("w", j, ·) for
    * bias + weights. 2k+1+2 rows for k features — driver-sized by
    * construction.
    */
  def logitRows(s: SparkSession,
                m: TextQueries.LogitModel): DataFrame = {
    import s.implicits._
    (m.means.zipWithIndex.map { case (v, i) => ("mean", i.toLong, v) } ++
      m.sds.zipWithIndex.map { case (v, i) => ("sd", i.toLong, v) } ++
      m.w.zipWithIndex.map { case (v, i) => ("w", i.toLong, v) })
      .toDF("param", "idx", "value")
  }

  /** Publish a model as the table's next version. */
  def publishLogit(s: SparkSession, t: VersionedTable,
                   m: TextQueries.LogitModel): Unit =
    t.overwrite(logitRows(s, m))

  /** Publish a fitted k-center cover ([[VectorQueries.noveltyModelRows]])
    * as the table's next version — same (param, idx, value) protocol,
    * so one registry table schema serves every model family.
    */
  def publishNovelty(t: VersionedTable, rows: DataFrame): Unit =
    t.overwrite(rows)

  /** The raw registry rows at `version`, collected (bounded — a
    * model's own row count) and refused loudly on duplicate
    * (param, idx) keys: a duplicated key means two models' rows share
    * the version (e.g. an external append instead of overwrite), and
    * since collect order over parquet is run-dependent, serving an
    * arbitrary survivor would mean serving a DIFFERENT model on
    * different runs with no error. Feed to the family's `...FromRows`
    * reconstructor (e.g. [[VectorQueries.noveltyScoreFromRows]]).
    */
  def loadRowsAt(t: VersionedTable, version: Long)
      : Array[org.apache.spark.sql.Row] = {
    val rows = t.readAt(version).collect()
    val dups = rows.groupBy(r => (r.getString(0), r.getLong(1)))
      .collect { case (k, vs) if vs.length > 1 => k }
    require(dups.isEmpty,
      s"registry version $version has duplicate (param, idx) rows: " +
        dups.toSeq.sorted.take(5).mkString(", "))
    rows
  }

  /** Contiguity guard shared by the loaders: the `p` rows must cover
    * idx 0..n-1 exactly — a gap would let sortBy silently pack
    * surviving values into the wrong slots.
    */
  private def denseSeq(rows: Array[org.apache.spark.sql.Row], p: String,
                       version: Long): Seq[Long] = {
    val m = rows.iterator.filter(_.getString(0) == p)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    require(m.keySet == (0L until m.size.toLong).toSet,
      s"registry version $version: '$p' rows are not dense at 0..n-1 " +
        s"(got idx ${m.keys.toSeq.sorted.mkString(",")})")
    (0 until m.size).map(i => m(i.toLong))
  }

  /** Load the model published at `version` (time travel — an audit or
    * rollback reads an older version with the same call). The collect
    * is the registry's own row count, bounded by construction; gaps,
    * duplicates, and arity mismatches refuse loudly instead of loading
    * a misaligned model.
    */
  def loadLogitAt(t: VersionedTable, version: Long)
      : TextQueries.LogitModel = {
    val rows = loadRowsAt(t, version)
    val m = TextQueries.LogitModel(denseSeq(rows, "mean", version),
      denseSeq(rows, "sd", version), denseSeq(rows, "w", version))
    require(m.means.nonEmpty && m.sds.size == m.means.size &&
      m.w.size == m.means.size + 1,
      s"registry version $version is not a logit model: " +
        s"${m.means.size} means, ${m.sds.size} sds, ${m.w.size} weights")
    m
  }
}
