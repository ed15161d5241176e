package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Normalize, TextFunctions, VectorFunctions}

/** Unit + property coverage for the expression-level function modules
  * (seeded random cases — deterministic re-runs).
  */
class FunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ── Normalize ─────────────────────────────────────────────────────────

  private def normalized(vs: String*): Seq[Option[String]] =
    vs.toDF("v").select(Normalize.placeholderToNull(col("v")).as("v"))
      .as[Option[String]].collect().toSeq

  test("placeholderToNull: sentinels, whitespace, legit values") {
    assert(normalized("NULL", "Null", "", "   ", "  x  ", "null") ===
      Seq(None, None, None, None, Some("x"), Some("null")))
  }

  test("property: normalization is idempotent") {
    val rnd = new scala.util.Random(7)
    val pool = Seq("NULL", " Null ", "", "  padded  ", "ok", "null ", "\tx")
    for (_ <- 1 to 5) {
      val vs = List.fill(20)(
        if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
        else rnd.alphanumeric.take(rnd.nextInt(8)).mkString)
      val once = normalized(vs: _*)
      val twice = once.map(_.orNull).toDF("v")
        .select(Normalize.placeholderToNull(col("v")).as("v"))
        .as[Option[String]].collect().toSeq
      assert(once === twice)
    }
  }

  test("normalizeStrings touches only string columns, one projection") {
    val df = Seq((1, "NULL", 2.5), (2, " ok ", 0.0)).toDF("i", "s", "d")
    val out = Normalize.normalizeStrings(df)
    assert(out.schema("i").dataType.typeName === "integer") // not stringified
    assert(out.schema("d").dataType.typeName === "double")
    assert(out.as[(Int, Option[String], Double)].collect().toSet ===
      Set((1, None, 2.5), (2, Some("ok"), 0.0)))
  }

  // ── TextFunctions ─────────────────────────────────────────────────────

  test("tokens/tokenCount: whitespace split, empty-safe") {
    val got = Seq("a  b\tc", "", "   ", "one").toDF("t")
      .select(TextFunctions.tokenCount(col("t"))).as[Int].collect().toSeq
    assert(got === Seq(3, 0, 0, 1))
  }

  test("shingles: k-grams, short docs empty") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(got.head === Seq("a b c", "b c d"))
    assert(got(1) === Nil)
  }

  test("property: explode row-count equals sum of shingle array sizes") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 5) {
      val texts = List.fill(10)(
        List.fill(rnd.nextInt(8))(
          rnd.alphanumeric.filter(_.isLetter).take(3).mkString)
          .mkString(" "))
      val df = texts.toDF("t")
        .select(TextFunctions.shingles(col("t"), 2).as("sh"))
      val total = df.select(coalesce(sum(size(col("sh"))), lit(0L)))
        .as[Long].collect().head
      val exploded = df.select(explode(col("sh"))).count()
      assert(exploded === total)
    }
  }

  test("subwordCount: letter runs, digit runs, punctuation singles") {
    val got = Seq("hello, world42!").toDF("t")
      .select(TextFunctions.subwordCount(col("t"))).as[Int].collect().head
    // hello , world 42 ! = 5
    assert(got === 5)
  }

  test("langId: marker argmax with und fallback") {
    val got = Seq(
      "the cat and the dog is here",
      "el perro y la casa es grande",
      "zzz qqq xxx").toDF("t")
      .select(TextFunctions.langId(col("t"))).as[String].collect().toSeq
    assert(got === Seq("en", "es", "und"))
  }

  test("fingerprint: whitespace-insensitive, case-insensitive") {
    val fps = Seq("Hello  World", "hello world", "other").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  // ── VectorFunctions ───────────────────────────────────────────────────

  test("cosine: known vectors") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),   // identical → 1
      (Seq(1f, 0f), Seq(0f, 1f)),   // orthogonal → 0
      (Seq(1f, 2f), Seq(2f, 4f)))   // parallel → 1
      .toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("l2Sq: known distance") {
    val got = Seq((Seq(1f, 2f, 3f), Seq(4f, 6f, 3f))).toDF("a", "b")
      .select(VectorFunctions.l2Sq(col("a"), col("b")))
      .as[Double].collect().head
    assert(got === 25.0) // 9 + 16 + 0
  }

  // ── curation funnel ───────────────────────────────────────────────────

  test("curationFunnel: first failing rule wins, every doc gets one verdict") {
    val good = ("the data and the model of the training run is large " +
      "and the tokens are clean and the text is long with many words ") * 3
    val unkLang = "to it or a an in " * 32 // stopword-rich, zero markers
    val docs = Seq(
      1L -> good,              // keep
      2L -> (good + "  "),     // same normalized fingerprint, higher id
      3L -> "hi there",        // 2 tokens
      4L -> "",                // empty
      5L -> "zz qq xx yy ww vv uu tt ss rr pp oo", // 12 tokens, no stops
      6L -> unkLang
    ).toDF("doc_id", "text")
    val got = graft.operators.TextQueries.curationFunnel(docs)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "keep", 2L -> "duplicate", 3L -> "too_short",
      4L -> "too_short", 5L -> "low_quality", 6L -> "unknown_lang"))
  }
}
