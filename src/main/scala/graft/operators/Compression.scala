package graft.operators

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: deflate each document and report
  * compressed/raw size in basis points. Highly repetitive or templated
  * text compresses far below normal prose, so curation pipelines
  * (Dolma's "gzip ratio", RedPajama-style heuristics) use the ratio as
  * a cheap noise/boilerplate filter that needs no model and no corpus
  * statistics — unlike [[graft.operators.Dedup]]'s repetition signals
  * it also catches WITHIN-doc redundancy that n-gram fractions miss
  * (long-period repeats, structural templating).
  *
  * Spec-checked rather than oracle-checked: the number depends on the
  * zlib encoding itself, which DuckDB cannot reproduce in SQL. The
  * spec pins determinism, the repetitive≪prose ordering, and edge
  * cases (empty text, sub-block inputs).
  *
  * 100 TB posture: a pure `mapPartitions` projection — zero shuffle,
  * embarrassingly parallel, ONE `Deflater` instance reused (reset)
  * across a partition so per-row cost is the deflate call itself, not
  * allocator churn. This op deliberately leaves whole-stage codegen
  * (JNI zlib dominates any interpreter overhead); keep it OUT of hot
  * relational plans and run it as its own projection stage.
  */
object Compression {

  /** Fixed level so the ratio is a stable corpus statistic: level 6 is
    * zlib's default speed/size balance and does not drift across JDK
    * zlib versions for the text sizes involved here.
    */
  private val LEVEL = 6

  /** (id, n_raw, n_deflate, ratio_bp) per doc; ratio_bp is null for
    * empty text (no meaningful ratio). nowrap deflate (raw stream, no
    * zlib header) so tiny docs aren't dominated by framing bytes.
    */
  def ratios(docs: DataFrame, id: String, text: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new Deflater(LEVEL, true)
        val buf = new Array[Byte](8192)
        it.map { case (docId, t) =>
          val raw = (if (t == null) "" else t)
            .getBytes(StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
          val ratio =
            if (raw.length == 0) None
            else Some(compressed * 10000L / raw.length)
          (docId, raw.length.toLong, compressed, ratio)
        }
      }
      .toDF("doc_id", "n_raw", "n_deflate", "ratio_bp")
  }
}
