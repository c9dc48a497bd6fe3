package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad: build a 3x key-shifted replication of sf0.1 (the
  * r15 scaling-pass recipe — pk and referencing fks shifted by
  * copy*(max+1) per copy, nation/region fixed, timestamps kept) so
  * slopes t(sf0.3)/t(sf0.1) can be measured against data ratio 3. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft_sf0.3"
    val spark: SparkSession = GraftSession
      .builder("graft-scaleup", Some("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)
    def rep(name: String, shifts: Map[String, Long]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val copies = (0 to 2).map { i =>
        shifts.foldLeft(df) { case (d, (c, m)) =>
          d.withColumn(c, col(c) + lit(i * (m + 1))) }
      }
      copies.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name done")
    }
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val supp = spark.read.parquet(s"$src/supplier.parquet")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val mOk = maxOf(ord, "o_orderkey"); val mCk = maxOf(cust, "c_custkey")
    val mPk = maxOf(part, "p_partkey"); val mSk = maxOf(supp, "s_suppkey")
    rep("orders", Map("o_orderkey" -> mOk, "o_custkey" -> mCk))
    rep("lineitem", Map("l_orderkey" -> mOk, "l_partkey" -> mPk, "l_suppkey" -> mSk))
    rep("customer", Map("c_custkey" -> mCk))
    rep("part", Map("p_partkey" -> mPk))
    rep("supplier", Map("s_suppkey" -> mSk))
    rep("events", Map("user_id" -> maxOf(ev, "user_id")))
    rep("documents", Map("doc_id" -> maxOf(docs, "doc_id")))
    rep("embeddings", Map("vec_id" -> maxOf(emb, "vec_id")))
    Seq("nation", "region").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").write.mode("overwrite")
        .parquet(s"$out/$n.parquet")
      println(s"[scaleup] $n copied")
    }
    spark.stop()
  }
}
