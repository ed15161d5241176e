package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver regenerates /root/testdata between rounds and has already
  * changed a physical type once (events.ts: TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)), which surfaced as 32 opaque per-query analysis
  * errors instead of one named failure. This spec reads every table's
  * Spark-visible schema at sf0.001 and asserts the engine's assumptions,
  * so the NEXT contract drift fails here first, loudly, with the table
  * and column named.
  *
  * Assertions are deliberately tolerant where the engine is tolerant
  * (events.ts may be any type [[Tables.epochMs]] understands; timestamps
  * may read TZ or NTZ depending on the writer's isAdjustedToUTC flag)
  * and exact where the engine is exact (join keys, value columns).
  */
class TestdataContractSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def schemaOf(table: String): Map[String, DataType] =
    spark.read.parquet(s"$sf/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertCol(table: String, schema: Map[String, DataType],
                        col: String, ok: Set[DataType]): Unit = {
    val dt = schema.getOrElse(col, fail(
      s"$table.$col missing — testdata contract drifted; engine queries select it"))
    assert(ok.contains(dt),
      s"$table.$col is $dt, engine assumes one of $ok — testdata contract drifted")
  }

  private val anyTimestamp: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("events: ts is epochMs-compatible, keys/values exact") {
    val s = schemaOf("events")
    assertCol("events", s, "ts", anyTimestamp) // Tables.epochMs handles these
    assertCol("events", s, "event_id", Set(LongType))
    assertCol("events", s, "user_id", Set(LongType))
    assertCol("events", s, "event_type", Set(StringType))
    assertCol("events", s, "value", Set(DoubleType))
    assertCol("events", s, "props", Set(StringType))
  }

  test("relational tables: keys, money columns, and dates hold their types") {
    val li = schemaOf("lineitem")
    assertCol("lineitem", li, "l_orderkey", Set(LongType))
    assertCol("lineitem", li, "l_partkey", Set(LongType))
    assertCol("lineitem", li, "l_suppkey", Set(LongType))
    assertCol("lineitem", li, "l_linenumber", Set(IntegerType))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .foreach(c => assertCol("lineitem", li, c, Set(DoubleType)))
    assertCol("lineitem", li, "l_shipdate", anyTimestamp)

    val o = schemaOf("orders")
    assertCol("orders", o, "o_orderkey", Set(LongType))
    assertCol("orders", o, "o_custkey", Set(LongType))
    assertCol("orders", o, "o_totalprice", Set(DoubleType))
    assertCol("orders", o, "o_orderdate", anyTimestamp)

    val c = schemaOf("customer")
    assertCol("customer", c, "c_custkey", Set(LongType))
    assertCol("customer", c, "c_nationkey", Set(IntegerType))
    assertCol("customer", c, "c_acctbal", Set(DoubleType))

    val n = schemaOf("nation")
    assertCol("nation", n, "n_nationkey", Set(IntegerType))
    assertCol("nation", n, "n_regionkey", Set(IntegerType))
    assertCol("region", schemaOf("region"), "r_regionkey", Set(IntegerType))
    assertCol("supplier", schemaOf("supplier"), "s_suppkey", Set(LongType))
    val p = schemaOf("part")
    assertCol("part", p, "p_partkey", Set(LongType))
    assertCol("part", p, "p_size", Set(IntegerType))
    assertCol("part", p, "p_retailprice", Set(DoubleType))
  }

  test("documents and embeddings: text and vector columns hold their types") {
    val d = schemaOf("documents")
    assertCol("documents", d, "doc_id", Set(LongType))
    assertCol("documents", d, "text", Set(StringType))
    assertCol("documents", d, "lang", Set(StringType))
    assertCol("documents", d, "source", Set(StringType))
    assertCol("documents", d, "n_chars", Set(LongType))

    val e = schemaOf("embeddings")
    assertCol("embeddings", e, "vec_id", Set(LongType))
    assertCol("embeddings", e, "label", Set(IntegerType))
    e("embedding") match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embeddings.embedding is $other, engine assumes array<float>")
    }
  }
}
