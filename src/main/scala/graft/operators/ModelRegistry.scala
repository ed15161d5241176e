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
    * model's own row count); feed to the family's `...FromRows`
    * reconstructor (e.g. [[VectorQueries.noveltyScoreFromRows]]).
    */
  def loadRowsAt(t: VersionedTable, version: Long)
      : Array[org.apache.spark.sql.Row] =
    t.readAt(version).collect()

  /** Load the model published at `version` (time travel — an audit or
    * rollback reads an older version with the same call). The collect
    * is the registry's own row count, bounded by construction.
    */
  def loadLogitAt(t: VersionedTable, version: Long)
      : TextQueries.LogitModel = {
    val rows = t.readAt(version).collect()
    def seq(p: String): Seq[Long] = rows.toSeq
      .filter(_.getString(0) == p)
      .sortBy(_.getLong(1)).map(_.getLong(2))
    val m = TextQueries.LogitModel(seq("mean"), seq("sd"), seq("w"))
    require(m.means.nonEmpty && m.sds.size == m.means.size &&
      m.w.size == m.means.size + 1,
      s"registry version $version is not a logit model: " +
        s"${m.means.size} means, ${m.sds.size} sds, ${m.w.size} weights")
    m
  }
}
