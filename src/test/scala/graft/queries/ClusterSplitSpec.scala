package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property q_cluster_split exists for: no near-dup cluster straddles
  * a split boundary — and the negative control showing a per-DOCUMENT
  * hash split does straddle on the same corpus (i.e. the guard is doing
  * real work, not passing vacuously).
  */
class ClusterSplitSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  private def withSplit(gidCol: String) = {
    val clusters = DedupQueries.qDedupClusters.run(spark, sf)
      .select(col("doc_id").as("cid"), col("cluster"))
    val grp = graft.Tables.documents(spark, sf)
      .join(clusters, col("doc_id") === col("cid"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("gid"))
    val b = conv(substring(md5(col(gidCol).cast("string")), 1, 6), 16, 10).cast("long") % 10000
    grp.select(col("doc_id"), col("gid"),
      when(b < 8000, "train").when(b < 9000, "test").otherwise("val").as("split"))
  }

  test("cluster-keyed split: every multi-doc cluster lands in exactly one split") {
    val straddling = withSplit("gid")
      .groupBy("gid").agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
      .filter(col("k") > 1)
      .count()
    assert(straddling == 0)
  }

  test("negative control: the per-document split DOES straddle clusters here") {
    val df = withSplit("doc_id")
    val multi = df.groupBy("gid")
      .agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
    assert(multi.filter(col("n") > 1).count() > 0, "corpus must contain near-dup clusters")
    assert(multi.filter(col("k") > 1).count() > 0,
      "doc-keyed split should leak on this corpus — otherwise the guard proves nothing")
    graft.ScratchCache.releaseAll()
  }
}
