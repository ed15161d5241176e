package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorQueries

/** Structural invariants of the blocked-DBSCAN gate (q_dbscan).
  *
  * The hash gate pins the exact output against the DuckDB twin; this
  * spec pins the DBSCAN *semantics* the twin could silently co-drift
  * on — the role/cluster contract every consumer of a density
  * clustering relies on.
  */
class DbscanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val roles =
    VectorQueries.queries("q_dbscan")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[String]("role"),
        r.getAs[Long]("cluster_id")))

  test("one row per corpus point; roles partition into core/border/noise") {
    val ids = roles.map(_._1)
    assert(ids.length == ids.distinct.length, "duplicate vec_id rows")
    // the duplicate-augmented corpus: originals plus planted copies
    val nOrig = spark.read
      .parquet(s"$sf/embeddings.parquet").count()
    assert(ids.length > nOrig, "planted copies missing from the node set")
    assert(roles.map(_._2).toSet.subsetOf(Set("core", "border", "noise")))
    // non-degenerate at this ε/minPts: all three roles occur
    assert(Set("core", "border", "noise").subsetOf(roles.map(_._2).toSet),
      s"degenerate role structure: ${roles.groupBy(_._2).view.mapValues(_.length).toMap}")
  }

  test("noise ⟺ cluster_id = −1; clustered points carry a real cluster") {
    roles.foreach { case (id, role, cl) =>
      if (role == "noise") assert(cl == -1L, s"noise $id has cluster $cl")
      else assert(cl >= 0L, s"$role $id lacks a cluster")
    }
  }

  test("cluster_id = min CORE id of the cluster; borders never form one") {
    val coreByCluster = roles.filter(_._2 == "core")
      .groupBy(_._3).view.mapValues(_.map(_._1).min).toMap
    // every cluster anchors on a core whose id IS the cluster_id
    roles.filter(_._3 >= 0).map(_._3).distinct.foreach { cl =>
      assert(coreByCluster.get(cl).contains(cl),
        s"cluster $cl is not anchored at its min core id " +
          s"(min core: ${coreByCluster.get(cl)})")
    }
  }

  test("planted identical copies mirror their original's role and cluster") {
    val byId = roles.map(r => r._1 -> (r._2, r._3)).toMap
    val copies = roles.filter(_._1 >= 1000000L)
    assert(copies.nonEmpty, "no planted copies in the output")
    copies.foreach { case (id, role, cl) =>
      val orig = byId(id - 1000000L)
      // identical vectors share a cell and (excluding each other) a
      // neighborhood, so DBSCAN must classify them identically
      assert((role, cl) == orig,
        s"copy $id ($role, $cl) diverged from original $orig")
    }
  }
}
