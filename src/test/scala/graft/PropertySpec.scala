package graft

import graft.operators.{DedupOps, TextOps, VectorOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the engine's scalar primitives: generated inputs,
  * checked through the REAL Spark expressions against independent
  * driver-side references. Fixed ScalaCheck seed — deterministic runs.
  */
class PropertySpec extends GraftSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vecGen: Gen[List[List[Float]]] =
    Gen.listOfN(100, Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 7.0f)))

  test("topk_by_score aggregate ≡ driver-side sort-take under ties and short groups") {
    import spark.implicits._
    // adversarial shape: heavy score ties (quantized scores), duplicate
    // ids across queries, and groups smaller than k
    val rowGen: Gen[List[(Long, Long, Double)]] = Gen.listOfN(600,
      for {
        q <- Gen.chooseNum(0L, 9L)
        id <- Gen.chooseNum(0L, 80L)
        s <- Gen.chooseNum(0, 20).map(_ / 10.0)
      } yield (q, id, s))
    val rows = sample(rowGen, 7L).distinct // (query, id) must be unique per group
      .groupBy(r => (r._1, r._2)).map(_._2.head).toList
    val k = 5
    val scored = rows.toDF("query_id", "neighbor_id", "cos")
    val got = VectorOps.topKPerQuery(scored, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    // reference: plain driver-side sort by (cos desc, id asc), take k
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      g.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, id, s), i) => (q, id, s, i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == expect)
    // short groups surface all members (some queries have < k candidates)
    assert(expect.groupBy(_._1).values.exists(_.size < k) ||
      rows.groupBy(_._1).values.forall(_.size >= k))
  }

  test("bitset_overlap ≡ driver-side set intersection on random id sets") {
    import spark.implicits._
    // ids span negative words, word boundaries, and sparse far words —
    // the two-pointer AND-walk must agree with plain Set intersection
    val idGen = Gen.listOfN(120, Gen.oneOf(
      Gen.chooseNum(-200L, 200L), Gen.chooseNum(-5L, 5L).map(_ * 64L),
      Gen.chooseNum(0L, 20L).map(_ * 1000003L)))
    (1L to 6L).foreach { seed =>
      val a = sample(idGen, seed).toSet
      val b = sample(idGen, seed + 100).toSet
      val df = a.toSeq.map(("a", _)).++(b.toSeq.map(("b", _))).toDF("side", "id")
      df.createOrReplaceTempView("bo_ids")
      val got = spark.sql(
        """select bitset_overlap(
          |  (select bitset_agg(id) from bo_ids where side = 'a'),
          |  (select bitset_agg(id) from bo_ids where side = 'b'))""".stripMargin)
        .head().getLong(0)
      assert(got == (a & b).size.toLong, s"seed $seed: $got vs ${(a & b).size}")
    }
    // disjoint and empty-side edges
    val e = Seq(("a", 1L)).toDF("side", "id")
    e.createOrReplaceTempView("bo_one")
    assert(spark.sql(
      """select bitset_overlap(bitset_agg(id), bitset_agg(id + 64)) from bo_one""")
      .head().getLong(0) == 0L)
  }

  test("custom aggregates are partition-invariant: merge order cannot change results") {
    // At cluster scale the merge path (partial aggregates meeting in the
    // exchange) runs under arbitrary row groupings; the signature and
    // top-k results must be identical whatever the input partitioning.
    // Repartitioning the INPUT changes which rows each partial fold
    // sees, so comparing against a single-partition run exercises
    // merge associativity/commutativity end-to-end.
    import spark.implicits._
    def sigs(parts: Int): Map[Long, Seq[Long]] =
      DedupOps.explodedShingleHashes(spark, sfDir).repartition(parts)
        .groupBy(col("doc_id"))
        .agg(call_function("minhash128", col("shingle")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val one = sigs(1)
    assert(one.nonEmpty)
    assert(sigs(29) == one, "minhash128 not partition-invariant")
    val rowGen: Gen[List[(Long, Long, Double)]] = Gen.listOfN(400,
      for {
        q <- Gen.chooseNum(0L, 7L)
        id <- Gen.chooseNum(0L, 60L)
        s <- Gen.chooseNum(0, 15).map(_ / 5.0)
      } yield (q, id, s))
    val rows = sample(rowGen, 11L)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toList
    def topk(parts: Int): Seq[(Long, Long, Double, Int)] =
      VectorOps.topKPerQuery(rows.toDF("query_id", "neighbor_id", "cos").repartition(parts), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val t1 = topk(1)
    assert(t1.nonEmpty)
    assert(topk(23) == t1, "topk_by_score not partition-invariant")
  }

  test("cosine/dot: symmetric, self-similar, and exactly the sequential fold") {
    import spark.implicits._
    val vs = sample(vecGen, 1L)
    // driver reference: the same left-to-right double fold
    def refDot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val pairs = vs.zip(vs.tail)
    val df = pairs.toDF("a", "b")
      .select(
        VectorOps.dot(col("a"), col("b")).as("ab"),
        VectorOps.dot(col("b"), col("a")).as("ba"),
        VectorOps.cosine(col("a"), col("b")).as("cab"),
        VectorOps.cosine(col("b"), col("a")).as("cba"),
        VectorOps.cosine(col("a"), col("a")).as("self"))
      .collect()
    df.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == refDot(a, b), "dot != sequential fold")
      assert(r.getDouble(0) == r.getDouble(1), "dot not symmetric")
      assert(r.getDouble(2) == r.getDouble(3), "cosine not symmetric")
      if (a.exists(_ != 0.0f)) assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    }
  }

  test("jaccard: bounded, symmetric, identity on distinct arrays") {
    import spark.implicits._
    val arrGen = Gen.listOfN(60,
      Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    val as = sample(arrGen, 2L).map(_.distinct)
    val pairs = as.zip(as.tail).filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val rows = pairs.toDF("a", "b")
      .select(
        TextOps.jaccard(col("a"), col("b")).as("jab"),
        TextOps.jaccard(col("b"), col("a")).as("jba"),
        TextOps.jaccard(col("a"), col("a")).as("self"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1), "jaccard not symmetric")
      assert(r.getDouble(2) == 1.0)
    }
    assert(rows.nonEmpty)
  }

  test("md5Hash64 matches an independent driver-side MD5-prefix reference") {
    import spark.implicits._
    def refHash(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hi = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val lo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      (hi << 32) | lo
    }
    val ss = sample(Gen.listOfN(200, Gen.asciiPrintableStr), 3L).filter(_.nonEmpty)
    val got = ss.toDF("s")
      .select(col("s"), DedupOps.md5Hash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ss.foreach(s => assert(got(s) == refHash(s), s"md5Hash64 mismatch for '$s'"))
  }

  test("connected components ≡ driver-side union-find on random graphs") {
    import graft.operators.CorpusOps
    import spark.implicits._
    // random sparse edge lists over up to 60 nodes — multiple components,
    // chains (high diameter), self-contained cliques, duplicate edges
    // b ≠ a by construction (offset in 1..59 mod 60) — a filtered Gen
    // inside listOfN can exhaust retries and yield None
    val edgeGen = Gen.listOfN(80, for {
      a <- Gen.chooseNum(0L, 59L); d <- Gen.chooseNum(1L, 59L)
    } yield { val b = (a + d) % 60; (math.min(a, b), math.max(a, b)) })
    def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node id in the component
      val byRoot = nodes.groupBy(find)
      byRoot.valuesIterator.flatMap(ns => ns.map(_ -> ns.min)).toMap
    }
    (10L to 12L).foreach { seed =>
      val edges = sample(edgeGen, seed).distinct
      val (labels, ids) = CorpusOps.connectedComponents(
        spark, edges.toDF("doc_a", "doc_b"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refComponents(edges)
      assert(got == want, s"seed $seed: distributed labels != union-find")
      ids.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    }

    // star-contraction variant: same fixed point on a random graph AND
    // on a 60-node chain — the adversarial high-diameter case, where it
    // must converge in O(log n) rounds (min-propagation would need ~59)
    val chain = (0L until 59L).map(i => (i, i + 1))
    val randomG = sample(edgeGen, 13L).distinct
    Seq("chain" -> chain, "random" -> randomG).foreach { case (name, edges) =>
      val (labels, ids, rounds) = CorpusOps.connectedComponentsDoubling(
        spark, edges.toDF("doc_a", "doc_b"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refComponents(edges), s"$name: doubling labels != union-find")
      if (name == "chain")
        assert(rounds <= 12, s"chain took $rounds rounds — not logarithmic")
      ids.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    }
  }

  test("connected components: reliable-checkpoint path matches union-find") {
    import graft.operators.CorpusOps
    import spark.implicits._
    // cluster mode: rounds checkpoint to fault-tolerant storage instead
    // of executor-local blocks; fixed point must be identical
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val hadOld = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val edges = ((0L until 10L).map(i => (i, i + 1)) :+ (40L, 41L) :+ (41L, 42L)).distinct
      def refLabels: Map[Long, Long] =
        (0L to 10L).map(_ -> 0L).toMap ++ Map(40L -> 40L, 41L -> 40L, 42L -> 40L)
      val (l1, ids1) = CorpusOps.connectedComponents(
        spark, edges.toDF("doc_a", "doc_b"), reliable = true)
      assert(l1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == refLabels)
      assert(ids1.isEmpty, "reliable path must not pin cached blocks")
      val (l2, ids2, _) = CorpusOps.connectedComponentsDoubling(
        spark, edges.toDF("doc_a", "doc_b"), reliable = true)
      assert(l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == refLabels)
      assert(ids2.isEmpty, "reliable path must not pin cached blocks")
      // checkpoint files actually landed in the reliable dir
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(ckptDir)).count() > 0)
    } finally {
      hadOld.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
    }
  }

  test("freq_sketch: MG guarantee holds under adversarial splits and merges") {
    import graft.functions.FreqSketchBuffer
    // Zipf-ish stream: item i appears ~N/i times, shuffled deterministically
    val stream = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .shuffle((1 to 60).flatMap(i => Seq.fill(3000 / i)(s"tok$i")).toVector)
    val n = stream.length.toLong
    val k = 15
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // adversarial merge tree: many tiny buffers, pairwise-merged in waves
    def runSplit(chunks: Seq[Seq[String]]): FreqSketchBuffer = {
      var bufs = chunks.map { c =>
        val b = new FreqSketchBuffer(k); c.foreach(b.add); b
      }.toVector
      while (bufs.length > 1)
        bufs = bufs.grouped(2).map {
          case Vector(a, b) => a.mergeFrom(b); a
          case Vector(a) => a
        }.toVector
      bufs.head
    }
    for (chunkSize <- Seq(1000, 97, 7)) {
      val merged = runSplit(stream.grouped(chunkSize).map(_.toSeq).toSeq)
      val got = {
        val m = scala.collection.mutable.Map[String, Long]()
        merged.counts.forEach { (i: String, c: Long) => m(i) = c; () }
        m.toMap
      }
      assert(got.size <= k)
      val bound = n / (k + 1) + 1
      exact.foreach { case (item, cnt) =>
        if (cnt > bound) assert(got.contains(item), s"chunk $chunkSize: lost $item (cnt=$cnt > $bound)")
      }
      got.foreach { case (item, est) =>
        val tru = exact(item)
        assert(est <= tru && est >= tru - bound, s"chunk $chunkSize: $item est=$est true=$tru")
      }
    }
  }

  test("d78 heavy hitters ≡ exact groupBy filter; candidate join broadcast") {
    val got = TextOps.d78HeavyHitters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
    val n = toks.count()
    val want = toks.groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, c) => c * TextOps.HeavyShareDiv >= n }
      .map { case (t, c) => (t, c, c * 10000 / n) }
      .sortBy { case (t, c, _) => (-c, t) }
    assert(got.toSeq == want.toSeq, s"got ${got.length} want ${want.length}")
    val plan = TextOps.d78HeavyHitters(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "candidate verify join must broadcast the bounded candidate set")
  }

  test("winnowing guarantee: any shared W+K-1-token run yields a shared fingerprint") {
    import spark.implicits._
    // random docs over a small alphabet, with a planted shared run of
    // EXACTLY WinnowW + WinnowK - 1 tokens (the guarantee's minimum)
    // spliced into each pair at independent random positions — the
    // detection must survive arbitrary repositioning, that's the point
    // of winnowing over head-anchored hashing
    val alpha = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val runLen = DedupOps.WinnowW + DedupOps.WinnowK - 1
    val gen = for {
      run <- Gen.listOfN(runLen, Gen.oneOf(alpha))
      bgA <- Gen.listOfN(30, Gen.oneOf(alpha))
      bgB <- Gen.listOfN(30, Gen.oneOf(alpha))
      posA <- Gen.chooseNum(0, 30)
      posB <- Gen.chooseNum(0, 30)
    } yield (run, bgA, bgB, posA, posB)
    val pairs = (1 to 20).map { i =>
      val (run, bgA, bgB, posA, posB) = sample(gen, 1000L + i)
      val docA = (bgA.take(posA) ++ run ++ bgA.drop(posA)).mkString(" ")
      val docB = (bgB.take(posB) ++ run ++ bgB.drop(posB)).mkString(" ")
      (2L * i, docA, 2L * i + 1, docB)
    }
    val docs = pairs.flatMap { case (ia, ta, ib, tb) => Seq((ia, ta), (ib, tb)) }
      .toDF("doc_id", "text")
    val fps = DedupOps.winnowFpsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    pairs.foreach { case (ia, _, ib, _) =>
      assert((fps(ia) & fps(ib)).nonEmpty,
        s"pair ($ia,$ib): shared $runLen-token run produced no shared fingerprint")
    }
    // density: the selection never exceeds the window-start count
    val counts = DedupOps.winnowFpsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    val grams = docs.collect().map(r =>
      r.getLong(0) -> (r.getString(1).split(" ").length - DedupOps.WinnowK + 1).toLong).toMap
    counts.foreach { case (id, nFp) =>
      assert(nFp <= math.max(1L, grams(id) - DedupOps.WinnowW + 1))
    }
  }
}
