package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.E): media payloads travel as
  * opaque binary columns with a typed metadata struct alongside. The
  * decode step is STUBBED deterministically (no image/audio libs in this
  * environment) — the Spark-side schema, batching, and partitioning are
  * real and tested.
  */
object MultimodalOps {

  /** e1: binary metadata extraction — blob length, content hash, format
    * sniff, stubbed decoded dimensions (deterministic from the hash). */
  def e1MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast("binary")
    val h = md5(blob)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(blob).as("n_bytes"),
        h.as("content_md5"),
        when(substring(col("text"), 1, 1).between("a", "z"), lit("text/plain"))
          .otherwise(lit("application/octet-stream")).as("sniffed_format"),
        (lit(640) + (ascii(substring(h, 1, 1)) % 16) * 80).as("width"),
        (lit(360) + (ascii(substring(h, 2, 1)) % 16) * 45).as("height"))
      .orderBy(col("doc_id"))
  }

  val e1Sql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS content_md5,
      |  CASE WHEN substring(text, 1, 1) BETWEEN 'a' AND 'z' THEN 'text/plain'
      |       ELSE 'application/octet-stream' END AS sniffed_format,
      |  CAST(640 + (ascii(substring(md5(text), 1, 1)) % 16) * 80 AS INTEGER) AS width,
      |  CAST(360 + (ascii(substring(md5(text), 2, 1)) % 16) * 45 AS INTEGER) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** A decoded media record: the real pipeline shape — metadata struct +
    * extracted feature vector, batch-produced per partition. */
  case class DecodedMedia(doc_id: Long, n_bytes: Int, width: Int, height: Int, features: Array[Float])

  /** Pluggable decoder seam: a real codec binding (JNI/FFI image or
    * audio library) drops in here without any change to the Spark-side
    * plumbing. Implementations must be Serializable (the instance ships
    * to executors) and receive rows in partition-local batches of
    * ≤ batchSize — the shape native bindings want for amortizing
    * per-call overhead (one native call per batch, not per row). */
  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[(Long, Array[Byte])]): Iterator[DecodedMedia]
  }

  /** Deterministic stand-in decoder: this sandbox has no codec
    * libraries, so dimensions/features are pseudo-decoded from the blob
    * hash. The schema, batching, and partitioning around it are real. */
  object StubDecoder extends MediaDecoder {
    def decode(batch: Seq[(Long, Array[Byte])]): Iterator[DecodedMedia] =
      batch.iterator.map { case (id, bytes) =>
        val h = java.util.Arrays.hashCode(bytes)
        val feats = Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xF).toFloat / 15f)
        DecodedMedia(id, bytes.length, 640 + (h & 0xF) * 80, 360 + ((h >>> 4) & 0xF) * 45, feats)
      }
  }

  /** REAL pure-JVM codec for the [[MediaDecoder]] seam: Netpbm PPM,
    * P6 (binary) and P3 (ASCII), maxval ≤ 255 — the one raster format
    * a from-scratch parser can decode with zero native deps, proving
    * the seam end-to-end on real pixels (the stub's dims are
    * hash-derived; these are measured). Header = magic, then
    * whitespace/`#`-comment-separated width, height, maxval; P6 pixel
    * data starts after exactly one whitespace byte. Features (8
    * floats, each normalized by maxval): mean R, G, B, global mean
    * luma ((r+g+b)/3), and the four quadrant mean lumas (top/left
    * halves take the ceiling split; an empty quadrant reads 0).
    * Undecodable or truncated blobs are DROPPED — a real pipeline
    * quarantines them, and the row-count delta is the observable. */
  object PpmDecoder extends MediaDecoder {
    private def parse(id: Long, bytes: Array[Byte]): Option[DecodedMedia] = {
      if (bytes.length < 2 || bytes(0) != 'P'.toByte) return None
      val kind = bytes(1).toChar
      if (kind != '3' && kind != '6') return None
      var pos = 2
      def skipWs(): Unit = {
        var more = true
        while (more && pos < bytes.length) {
          val c = bytes(pos).toChar
          if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
          else more = false
        }
      }
      def nextInt(): Int = {
        skipWs()
        val st = pos
        while (pos < bytes.length && bytes(pos) >= '0'.toByte && bytes(pos) <= '9'.toByte)
          pos += 1
        if (pos == st || pos - st > 9) -1
        else new String(bytes, st, pos - st, "US-ASCII").toInt
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      val n = w.toLong * h
      if (n > Int.MaxValue / 3) return None
      val px = new Array[Int](3 * n.toInt)
      if (kind == '6') {
        pos += 1 // the single post-maxval whitespace byte
        if (bytes.length - pos < 3 * n) return None
        var i = 0
        while (i < 3 * n) { px(i) = bytes(pos + i) & 0xFF; i += 1 }
      } else {
        var i = 0
        while (i < 3 * n) {
          val v = nextInt()
          if (v < 0 || v > maxval) return None
          px(i) = v; i += 1
        }
      }
      Some(DecodedMedia(id, bytes.length, w, h, rgbFeatures(px, w, h, maxval)))
    }
    def decode(batch: Seq[(Long, Array[Byte])]): Iterator[DecodedMedia] =
      batch.iterator.flatMap { case (id, b) => parse(id, b) }
  }

  /** The shared 8-float feature contract over interleaved RGB pixels
    * (3wh ints, row-major): mean R, G, B, global mean luma, and the
    * four quadrant mean lumas (ceiling split for the top/left halves),
    * each normalized by `maxval`. Every raster decoder on the
    * [[MediaDecoder]] seam emits THIS vector, so downstream frame-dedup
    * / ANN over the features is codec-agnostic. */
  private[operators] def rgbFeatures(px: Array[Int], w: Int, h: Int, maxval: Int): Array[Float] = {
    val n = w.toLong * h
    var sr = 0L; var sg = 0L; var sb = 0L
    val qSum = new Array[Long](4); val qCnt = new Array[Long](4)
    val ch = (h + 1) / 2; val cw = (w + 1) / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 3 * (y * w + x)
        val r = px(o); val g = px(o + 1); val b = px(o + 2)
        sr += r; sg += g; sb += b
        val q = (if (y < ch) 0 else 2) + (if (x < cw) 0 else 1)
        qSum(q) += r + g + b; qCnt(q) += 1
        x += 1
      }
      y += 1
    }
    def quadLuma(s: Long, c: Long): Float =
      if (c == 0) 0f else (s.toDouble / 3.0 / c / maxval).toFloat
    Array(
      (sr.toDouble / n / maxval).toFloat,
      (sg.toDouble / n / maxval).toFloat,
      (sb.toDouble / n / maxval).toFloat,
      ((sr + sg + sb).toDouble / 3.0 / n / maxval).toFloat,
      quadLuma(qSum(0), qCnt(0)), quadLuma(qSum(1), qCnt(1)),
      quadLuma(qSum(2), qCnt(2)), quadLuma(qSum(3), qCnt(3)))
  }

  /** REAL-WORLD raster codec for the [[MediaDecoder]] seam: PNG, JPEG,
    * GIF, BMP via `javax.imageio` — pure JVM, zero extra dependencies,
    * the formats an actual image corpus arrives in (PpmDecoder proved
    * the seam on Netpbm; this prices e8/e14 on measured dims of real
    * formats). Same 8-float [[rgbFeatures]] contract at maxval 255,
    * alpha ignored (ImageIO premultiplies nothing here — we read the
    * sRGB channels). Undecodable / truncated / unrecognized blobs are
    * DROPPED like PpmDecoder's (quarantine-by-row-count observable).
    * `ImageIO.setUseCache(false)` keeps executors off disk-backed
    * stream caches — decode stays in-memory per batch. */
  object ImageIoDecoder extends MediaDecoder {
    private def parse(id: Long, bytes: Array[Byte]): Option[DecodedMedia] =
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          if (w.toLong * h > Int.MaxValue / 3) None
          else {
            // one row at a time keeps the int buffer bounded by width
            val px = new Array[Int](3 * w * h)
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val argb = row(x)
                val o = 3 * (y * w + x)
                px(o) = (argb >>> 16) & 0xFF
                px(o + 1) = (argb >>> 8) & 0xFF
                px(o + 2) = argb & 0xFF
                x += 1
              }
              y += 1
            }
            Some(DecodedMedia(id, bytes.length, w, h, rgbFeatures(px, w, h, 255)))
          }
        }
      } catch { case _: Exception => None }
    def decode(batch: Seq[(Long, Array[Byte])]): Iterator[DecodedMedia] =
      batch.iterator.flatMap { case (id, b) => parse(id, b) }
  }

  /** Batch decode API: mapPartitions over (id, blob) rows, feeding the
    * decoder partition-local batches. Swap `decoder` for a real codec
    * implementation of [[MediaDecoder]]; the default is the documented
    * deterministic stub. */
  def decodeBatch(spark: SparkSession, blobs: DataFrame, batchSize: Int = 64,
                  decoder: MediaDecoder = StubDecoder): Dataset[DecodedMedia] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(decoder.decode))
  }

  /** One sampled frame of a (pseudo-)video blob: 1 blob → N rows. */
  case class SampledFrame(doc_id: Long, frame_idx: Int, offset: Int, features: Array[Float])

  /** Frame sampling seam: like [[MediaDecoder]] but 1 → N — a video
    * codec emits every k-th frame's features. Implementations must be
    * Serializable; they see partition-local batches. */
  trait FrameSampler extends Serializable {
    def sample(batch: Seq[(Long, Array[Byte])]): Iterator[SampledFrame]
  }

  /** Deterministic stand-in sampler: treats every `stride` bytes of the
    * blob as one "frame" and emits a fixed-width feature per frame —
    * the 1→N row shape, batching, and schema a real video codec needs,
    * with the codec itself stubbed (none available in this sandbox). */
  class StrideSampler(stride: Int = 256, maxFrames: Int = 8) extends FrameSampler {
    def sample(batch: Seq[(Long, Array[Byte])]): Iterator[SampledFrame] =
      batch.iterator.flatMap { case (id, bytes) =>
        val n = math.min(maxFrames, math.max(1, bytes.length / stride))
        (0 until n).iterator.map { i =>
          val off = i * stride
          val window = bytes.slice(off, math.min(off + stride, bytes.length))
          val h = java.util.Arrays.hashCode(window)
          SampledFrame(id, i, off, Array.tabulate(4)(j => ((h >>> (j * 8)) & 0xFF).toFloat / 255f))
        }
      }
  }

  /** Batch frame sampling over (id, blob) rows — mapPartitions with
    * partition-local batches, exploding each blob into its sampled
    * frames. Downstream (embedding, dedup, ANN) consumes the frame
    * rows like any other corpus. */
  def sampleFrames(spark: SparkSession, blobs: DataFrame, batchSize: Int = 64,
                   sampler: FrameSampler = new StrideSampler()): Dataset[SampledFrame] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(sampler.sample))
  }

  /** Byte budget per shard file for e2 (64 KiB at test scale; a real
    * WebDataset-style layout uses ~100 MB–1 GB — only the constant
    * changes). */
  val ShardBytes = 65536L

  /** e2: shard manifest for blob datasets — the WebDataset/tar-shard
    * layout plan: blobs are laid out in (source, doc_id) order and each
    * is assigned to the shard where its cumulative byte offset starts
    * (greedy fill; a shard may overflow by at most one blob, so no blob
    * is ever split). Per-SOURCE running offsets (the d24 packing shape)
    * — parallelism = #sources, never one global cumsum; all integer
    * arithmetic, so the manifest is bit-identical on any engine or
    * parallelism. The writer then realizes shards via
    * repartition(shard_idx) + sortWithinPartitions. */
  def e2BlobShard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
      .withColumn("end_byte", sum(col("n_bytes").cast("long")).over(w))
      // `div`/`%` are true long arithmetic — floor(a / n) would route
      // through a double and only stay exact below 2^53 byte offsets
      .withColumn("start_byte", col("end_byte") - col("n_bytes"))
      .select(col("doc_id"), col("source"), col("n_bytes"),
        expr(s"start_byte div $ShardBytes").as("shard_idx"),
        expr(s"start_byte % $ShardBytes").as("offset_in_shard"))
      .orderBy(col("doc_id"))
  }

  /** Pure-JVM POSIX ustar archive codec — the REAL bytes behind e17's
    * layout math (the WebDataset interchange: a training shard IS a
    * tar whose members a loader seeks into by offset). From-scratch
    * ustar (IEEE 1003.1): 512-byte header (name, octal size/mode/
    * mtime, checksum-over-spaces, `ustar\0` magic), data padded to
    * the 512 boundary, two zero end-of-archive blocks. [[tarBytes]]
    * and [[readTar]] round-trip; the spec additionally proves e17's
    * per-member offsets point at the EXACT header of the named member
    * inside the real archive — the manifest is seek-accurate, not
    * just arithmetic. Kept deterministic for content-addressing:
    * mode/mtime/uid/gid are fixed zeros, so identical members yield
    * identical archive bytes (e6/e13's checksum ledger applies to
    * shards too). */
  object Tar {
    private def octal(v: Long, width: Int): Array[Byte] = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
      padded.getBytes("US-ASCII")
    }

    private def header(name: String, size: Long): Array[Byte] = {
      require(name.getBytes("US-ASCII").length <= 100, s"tar member name too long: $name")
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(octal(0L, 8), 0, h, 100, 8)   // mode (deterministic zeros)
      System.arraycopy(octal(0L, 8), 0, h, 108, 8)   // uid
      System.arraycopy(octal(0L, 8), 0, h, 116, 8)   // gid
      System.arraycopy(octal(size, 12), 0, h, 124, 12)
      System.arraycopy(octal(0L, 12), 0, h, 136, 12) // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces first
      h(156) = '0'                                   // typeflag: regular file
      System.arraycopy(("ustar" + "\u0000" + "00").getBytes("US-ASCII"), 0, h, 257, 8)
      val sum = h.map(_ & 0xFF).sum.toLong
      val cs = java.lang.Long.toOctalString(sum)
      val csb = (("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes("US-ASCII")
      System.arraycopy(csb, 0, h, 148, 8)
      h
    }

    /** Stream members (in order) into `out` as one ustar archive and
      * return the archive's byte count. Constant memory per MEMBER (one
      * blob at a time), never per archive — the shape a real ~1 GB
      * WebDataset shard needs; [[tarBytes]] is this over a byte buffer.
      * The caller owns closing `out`. */
    def writeTo(out: java.io.OutputStream, members: Iterator[(String, Array[Byte])]): Long = {
      var written = 0L
      members.foreach { case (name, data) =>
        out.write(header(name, data.length.toLong))
        out.write(data)
        val pad = (512 - data.length % 512) % 512
        out.write(new Array[Byte](pad))
        written += 512L + data.length + pad
      }
      out.write(new Array[Byte](1024)) // end-of-archive blocks
      written + 1024L
    }

    /** Serialize members (in order) into one in-memory ustar archive. */
    def tarBytes(members: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      writeTo(out, members.iterator)
      out.toByteArray
    }

    /** Walk an archive STREAM header-by-header without materializing
      * member data: emits (name, size, header_offset) per member,
      * skipping each member's data+padding — constant memory, exactly
      * what a loader's index builder does over a multi-GB shard.
      * Verifies each header checksum like [[readTar]]. */
    def walkStream(in: java.io.InputStream): Seq[(String, Long, Long)] = {
      val out = Seq.newBuilder[(String, Long, Long)]
      val h = new Array[Byte](512)
      var pos = 0L
      var done = false
      while (!done) {
        var got = 0
        var r = 0
        while (got < 512 && r >= 0) {
          r = in.read(h, got, 512 - got)
          if (r > 0) got += r
        }
        if (got < 512 || h(0) == 0) done = true
        else {
          val stored = new String(h, 148, 6, "US-ASCII").trim
          val hv = h.clone()
          java.util.Arrays.fill(hv, 148, 156, ' '.toByte)
          val sum = hv.map(_ & 0xFF).sum.toLong
          require(java.lang.Long.parseLong(stored, 8) == sum, s"tar checksum at $pos")
          val name = new String(h.take(100).takeWhile(_ != 0), "US-ASCII")
          val size = java.lang.Long.parseLong(new String(h, 124, 11, "US-ASCII").trim, 8)
          out += ((name, size, pos))
          var toSkip = ((size + 511L) / 512L) * 512L
          while (toSkip > 0) {
            val s = in.skip(toSkip)
            if (s <= 0) { // skip() may return 0 on some streams: read instead
              if (in.read() < 0) throw new java.io.EOFException(s"truncated tar at $pos")
              toSkip -= 1
            } else toSkip -= s
          }
          pos += 512L + ((size + 511L) / 512L) * 512L
        }
      }
      out.result()
    }

    /** Fold over an archive STREAM member-by-member: each member's
      * payload is read fully (memory bounded by the LARGEST member,
      * never the archive — a ~1 GB shard streams through), passed to
      * `f` with its name, and discarded. Header checksums verified
      * like [[readTar]]. The shard-integrity audit shape: hash every
      * member without ever holding two. */
    def mapMembersStream[T](in: java.io.InputStream,
                            f: (String, Array[Byte]) => T): Seq[T] = {
      val out = Seq.newBuilder[T]
      val h = new Array[Byte](512)
      var done = false
      def readFully(buf: Array[Byte], len: Int): Int = {
        var got = 0
        var r = 0
        while (got < len && r >= 0) {
          r = in.read(buf, got, len - got)
          if (r > 0) got += r
        }
        got
      }
      while (!done) {
        if (readFully(h, 512) < 512 || h(0) == 0) done = true
        else {
          val stored = new String(h, 148, 6, "US-ASCII").trim
          val hv = h.clone()
          java.util.Arrays.fill(hv, 148, 156, ' '.toByte)
          require(java.lang.Long.parseLong(stored, 8) == hv.map(_ & 0xFF).sum.toLong,
            "tar member checksum")
          val name = new String(h.take(100).takeWhile(_ != 0), "US-ASCII")
          val size = java.lang.Long.parseLong(new String(h, 124, 11, "US-ASCII").trim, 8)
          val data = new Array[Byte](size.toInt)
          require(readFully(data, size.toInt) == size.toInt, s"truncated member $name")
          val pad = ((size + 511L) / 512L * 512L - size).toInt
          if (pad > 0) require(readFully(new Array[Byte](pad), pad) == pad, "truncated padding")
          out += f(name, data)
        }
      }
      out.result()
    }

    /** Parse a ustar archive back into (name, data) members, verifying
      * each header checksum; stops at the zero end-of-archive block. */
    def readTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
      val out = Seq.newBuilder[(String, Array[Byte])]
      var pos = 0
      while (pos + 512 <= bytes.length && bytes(pos) != 0) {
        val h = java.util.Arrays.copyOfRange(bytes, pos, pos + 512)
        val stored = new String(h, 148, 6, "US-ASCII").trim
        java.util.Arrays.fill(h, 148, 156, ' '.toByte)
        val sum = h.map(_ & 0xFF).sum.toLong
        require(java.lang.Long.parseLong(stored, 8) == sum, s"tar checksum at $pos")
        val name = new String(h.take(100).takeWhile(_ != 0), "US-ASCII")
        val size = java.lang.Long.parseLong(
          new String(h, 124, 11, "US-ASCII").trim, 8)
        val data = java.util.Arrays.copyOfRange(
          bytes, pos + 512, pos + 512 + size.toInt)
        out += ((name, data))
        pos += 512 + ((size + 511) / 512).toInt * 512
      }
      out.result()
    }
  }

  /** e17: tar-framed shard layout — the WebDataset-style physical
    * manifest (tar is THE loader interchange for multimodal training
    * shards): e2 assigns blobs to shards by raw bytes; this prices the
    * actual archive layout — per member, the tar framing (one 512-byte
    * header + data padded to the 512 boundary), the member's byte
    * offset inside its shard archive, and the finished archive size
    * (members + the two 512-byte end-of-archive blocks). The offsets
    * are what an index-based loader seeks to; the framed sizes are
    * what capacity planning must use (raw bytes under-count small-blob
    * shards by up to ~2× — header+padding dominates tiny members,
    * which is the real reason WebDataset shards want big members).
    *
    * All integral: ceil via `(n + 511) div 512`, offsets by running
    * sums — `div`, never a float floor. Shape: ONE scan → e2's
    * per-source running-sum window (the shard assignment — unchanged,
    * so e2 and e17 agree row-for-row) → a second window partitioned by
    * (source, shard) in the same doc_id order for member offsets +
    * the shard-total window. Both windows ride ONE source exchange
    * (same partitioning lineage, e2 precedent). */
  def e17TarLayout(spark: SparkSession, dir: String): DataFrame =
    e17LayoutFrame(spark, dir).orderBy(col("doc_id"))

  /** e17's lineage WITHOUT the presentation sort — consumers that
    * re-partition anyway (e23's per-shard coalescer) start here so the
    * global doc_id range-sort never executes mid-pipeline. */
  def e17LayoutFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wShard = Window.partitionBy(col("source"), col("shard_idx")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wShardAll = Window.partitionBy(col("source"), col("shard_idx"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .withColumn("end_byte", sum(col("n_bytes")).over(wSrc))
      .withColumn("shard_idx", expr(s"(end_byte - n_bytes) div $ShardBytes"))
      .withColumn("framed_bytes", expr("512 + ((n_bytes + 511) div 512) * 512"))
      .withColumn("member_offset", sum(col("framed_bytes")).over(wShard) - col("framed_bytes"))
      .withColumn("shard_tar_bytes", sum(col("framed_bytes")).over(wShardAll) + lit(1024L))
      .select(col("doc_id"), col("source"), col("shard_idx"), col("n_bytes"),
        col("framed_bytes"), col("member_offset"), col("shard_tar_bytes"))
  }

  val e17Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents),
       |laid AS (
       |  SELECT *, sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes AS start_byte
       |  FROM sized),
       |sharded AS (
       |  SELECT doc_id, source, n_bytes,
       |    CAST(start_byte // $ShardBytes AS BIGINT) AS shard_idx,
       |    512 + ((n_bytes + 511) // 512) * 512 AS framed_bytes
       |  FROM laid),
       |off AS (
       |  SELECT *, sum(framed_bytes) OVER (PARTITION BY source, shard_idx ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - framed_bytes AS member_offset,
       |    sum(framed_bytes) OVER (PARTITION BY source, shard_idx) + 1024 AS shard_tar_bytes
       |  FROM sharded)
       |SELECT doc_id, source, shard_idx, n_bytes,
       |  CAST(framed_bytes AS BIGINT) AS framed_bytes,
       |  CAST(member_offset AS BIGINT) AS member_offset,
       |  CAST(shard_tar_bytes AS BIGINT) AS shard_tar_bytes
       |FROM off ORDER BY doc_id""".stripMargin

  val e2Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
       |  FROM documents),
       |laid AS (
       |  SELECT doc_id, source, n_bytes,
       |    CAST(sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_bytes AS start_byte
       |  FROM sized)
       |SELECT doc_id, source, n_bytes,
       |  start_byte // $ShardBytes AS shard_idx,
       |  start_byte - (start_byte // $ShardBytes) * $ShardBytes AS offset_in_shard
       |FROM laid ORDER BY doc_id""".stripMargin

  /** End-to-end frame near-dup pipeline over the sampler seam: sample
    * frames from every blob (1→N), bucket frames by their quantized
    * feature vector (the d13 LSH shape — an equi-join key, NEVER an
    * all-pairs frame comparison), then verify candidates with the
    * native codegen'd cosine Expression at `tau`. Output: frame pairs
    * from DIFFERENT blobs that are near-identical — the cross-video
    * duplicate-frame detector a video-dedup pass runs before training.
    * Works unchanged over a real codec's features once one drops into
    * [[FrameSampler]]; bucket quantization (`grid`) trades recall for
    * candidate count exactly like d13's planes. */
  def frameDupPairs(spark: SparkSession, blobs: DataFrame,
                    batchSize: Int = 64, sampler: FrameSampler = new StrideSampler(),
                    grid: Int = 8, tau: Double = 0.999): DataFrame = {
    // TWO half-cell-offset grids: a near-identical pair whose quantized
    // feature straddles a cell boundary in one grid shares a cell in the
    // offset grid, closing the single-grid boundary-recall gap. The grid
    // tag rides in the key so g0/g1 cells never cross-join; candidates
    // matched by both grids are deduped before the cosine verify.
    def gkey(off: Double): Column = concat_ws(",",
      transform(col("features"), f => round(f * grid + lit(off)).cast("int").cast("string")))
    // persist: the self-join reads the frame set twice, and without it
    // the sampler/decode (the expensive step with a real codec) runs
    // once per side per grid. Blocks are released with the plan —
    // callers doing many dedup passes over the same frames should lift
    // sampleFrames out and checkpoint it instead.
    val frames = sampleFrames(spark, blobs, batchSize, sampler).toDF()
      .select(col("doc_id"), col("frame_idx"), col("features"),
        explode(array(concat_ws(":", lit("g0"), gkey(0.0)),
          concat_ws(":", lit("g1"), gkey(0.5)))).as("bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = frames.select(col("doc_id").as("doc_a"), col("frame_idx").as("frame_a"),
      col("features").as("fa"), col("bkey"))
    val b = frames.select(col("doc_id").as("doc_b"), col("frame_idx").as("frame_b"),
      col("features").as("fb"), col("bkey"))
    a.join(b, "bkey")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("frame_a"), col("fa"), col("doc_b"), col("frame_b"), col("fb"))
      .distinct()
      .withColumn("cos", VectorOps.cosine(col("fa"), col("fb")))
      .filter(col("cos") >= tau)
      .select(col("doc_a"), col("frame_a"), col("doc_b"), col("frame_b"), col("cos"))
  }

  /** e3: shard-manifest efficiency report — what a dataloader owner
    * checks before training: per (source, shard), blob count, used
    * bytes, and the fill factor against the shard budget. Blobs are
    * assigned by START offset (e2's rule), so a boundary-straddling
    * blob's bytes count toward its start shard and fill can slightly
    * exceed 1 — the honest accounting for "blob never split". A
    * reduce over e2's manifest: same single scan + per-source window,
    * one more group exchange over manifest rows. */
  def e3ShardStats(spark: SparkSession, dir: String): DataFrame =
    e2BlobShard(spark, dir)
      .groupBy(col("source"), col("shard_idx"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("n_bytes").cast("long")).as("used_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("fill", col("used_bytes").cast("double") / lit(ShardBytes.toDouble))
      .orderBy(col("source"), col("shard_idx"))

  val e3Sql: String =
    s"""WITH manifest AS ($e2Sql)
       |SELECT source, shard_idx, count(*) AS n_blobs,
       |  CAST(sum(n_bytes) AS BIGINT) AS used_bytes,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  CAST(sum(n_bytes) AS BIGINT) / CAST($ShardBytes AS DOUBLE) AS fill
       |FROM manifest GROUP BY 1, 2 ORDER BY source, shard_idx""".stripMargin

  /** e4: modality/format profile — the dataset-card table a multimodal
    * corpus publishes per (source, sniffed format): blob count, total /
    * min / max bytes, and mean decoded dimensions from e1's metadata.
    * A reduce over e1's row-local projection: one scan, one
    * (source, format) group exchange, integer-exact sums with the two
    * means as final divisions. At 100 TB this is the cheap audit pass
    * that sizes the e2 shard plan. */
  def e4FormatProfile(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast("binary")
    val h = md5(blob)
    Tables.documents(spark, dir)
      .select(
        col("source"),
        when(substring(col("text"), 1, 1).between("a", "z"), lit("text/plain"))
          .otherwise(lit("application/octet-stream")).as("format"),
        octet_length(blob).cast("long").as("n_bytes"),
        (lit(640) + (ascii(substring(h, 1, 1)) % 16) * 80).cast("long").as("width"),
        (lit(360) + (ascii(substring(h, 2, 1)) % 16) * 45).cast("long").as("height"))
      .groupBy(col("source"), col("format"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        (sum(col("width")).cast("double") / count(lit(1))).as("mean_width"),
        (sum(col("height")).cast("double") / count(lit(1))).as("mean_height"))
      .orderBy(col("source"), col("format"))
  }

  val e4Sql: String =
    """WITH meta AS (
      |  SELECT source,
      |    CASE WHEN substring(text, 1, 1) BETWEEN 'a' AND 'z' THEN 'text/plain'
      |         ELSE 'application/octet-stream' END AS format,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    CAST(640 + (ascii(substring(md5(text), 1, 1)) % 16) * 80 AS BIGINT) AS width,
      |    CAST(360 + (ascii(substring(md5(text), 2, 1)) % 16) * 45 AS BIGINT) AS height
      |  FROM documents)
      |SELECT source, format, count(*) AS n_blobs,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes,
      |  CAST(sum(width) AS DOUBLE) / count(*) AS mean_width,
      |  CAST(sum(height) AS DOUBLE) / count(*) AS mean_height
      |FROM meta GROUP BY 1, 2 ORDER BY source, format""".stripMargin

  /** Square patch edge (pixels) for e5's vision-token cost model: an
    * image contributes (width div patch) × (height div patch) patch
    * tokens — the ViT-style accounting every interleaved multimodal
    * trainer budgets sequences with. */
  val PatchPx = 160L

  /** e5: interleaved multimodal sequence packing — the d24/e2 idea at
    * the MULTIMODAL grain: a training item is text tokens + the image's
    * patch tokens + one image-boundary marker, and items are laid into
    * fixed token-budget sequences in (source, doc_id) order with e2's
    * start-offset rule (an item is assigned where its cumulative offset
    * STARTS, so a sequence overflows by at most one item and an image's
    * patches are never split across sequences — splitting patches,
    * unlike splitting text, would orphan attention to the image). Patch
    * counts derive from e1's stubbed decode dims (real codec drops in
    * via MediaDecoder without touching this plan). Per-source window
    * cumsum — parallelism = #sources, all-integer `div`/`%`,
    * bit-identical on any engine or parallelism. */
  def e5InterleavePack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("text").cast("binary"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_text_tokens"),
        (lit(640) + (ascii(substring(h, 1, 1)) % 16) * 80).cast("long").as("width"),
        (lit(360) + (ascii(substring(h, 2, 1)) % 16) * 45).cast("long").as("height"))
      // `div` is true long division — `/` on long Columns routes through
      // a double (the d24/e2 bit-stability rule)
      .withColumn("n_patches",
        expr(s"(width div $PatchPx) * (height div $PatchPx)"))
      .withColumn("item_tokens", col("n_text_tokens") + col("n_patches") + 1L)
      .withColumn("end_tok", sum(col("item_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("item_tokens"))
      .select(col("doc_id"), col("source"), col("n_text_tokens"), col("n_patches"),
        col("item_tokens"),
        expr(s"start_tok div ${CorpusOps.SeqLen}").as("seq_idx"),
        expr(s"start_tok % ${CorpusOps.SeqLen}").as("offset_in_seq"))
      .orderBy(col("doc_id"))
  }

  val e5Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_text_tokens,
       |    (CAST(640 + (ascii(substring(md5(text), 1, 1)) % 16) * 80 AS BIGINT) // $PatchPx) *
       |      (CAST(360 + (ascii(substring(md5(text), 2, 1)) % 16) * 45 AS BIGINT) // $PatchPx) AS n_patches
       |  FROM documents),
       |item AS (
       |  SELECT *, n_text_tokens + n_patches + 1 AS item_tokens FROM sized),
       |laid AS (
       |  SELECT *, CAST(sum(item_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - item_tokens AS start_tok
       |  FROM item)
       |SELECT doc_id, source, n_text_tokens, n_patches, item_tokens,
       |  start_tok // ${CorpusOps.SeqLen} AS seq_idx,
       |  start_tok % ${CorpusOps.SeqLen} AS offset_in_seq
       |FROM laid ORDER BY doc_id""".stripMargin

  /** Epoch count for the e7 schedule. */
  val Epochs = 4

  /** e7: epoch reshuffle schedule — the between-epochs shard
    * permutation a training loader consumes (each epoch must visit
    * every shard exactly once, in a different but fully deterministic
    * order, with no coordinator state): shard set derived from e2's
    * layout arithmetic (per-source byte total → dense shard ids — no
    * window needed, the offsets are contiguous by construction), then
    * each (shard, epoch) pair is ordered by a salted md5 of
    * (source, shard, epoch) — epoch as the salt — and positioned by a
    * row_number over the epoch partition. Everything past the one
    * per-source byte aggregate is MANIFEST-grain (shards × epochs
    * rows, never data rows); at 100 TB that is ~10⁶ rows of schedule
    * for ~10⁹ blobs. Spec proves each epoch is a permutation of the
    * same shard set and epochs genuinely reorder. */
  def e7EpochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val wEpoch = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"))
      .orderBy(col("shuffle_key"), col("source"), col("shard_idx"))
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(octet_length(col("text").cast("binary")).cast("long")).as("total_bytes"))
      .select(col("source"), explode(expr(
        s"sequence(0L, (total_bytes + ${ShardBytes - 1}L) div ${ShardBytes}L - 1L)"))
        .as("shard_idx"))
      .select(col("source"), col("shard_idx"),
        explode(expr(s"sequence(0, ${Epochs - 1})")).as("epoch"))
      .withColumn("shuffle_key",
        md5(concat_ws(":", col("source"), col("shard_idx"), col("epoch"))))
      .select(col("epoch"), col("source"), col("shard_idx"),
        row_number().over(wEpoch).as("position"))
      .orderBy(col("epoch"), col("position"))
  }

  val e7Sql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       |  FROM documents GROUP BY 1),
       |shards AS (
       |  SELECT source,
       |    unnest(range(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes)) AS shard_idx
       |  FROM s),
       |e AS (
       |  SELECT source, shard_idx, unnest(range(0, $Epochs)) AS epoch FROM shards),
       |k AS (
       |  SELECT epoch, source, shard_idx,
       |    md5(source || ':' || shard_idx || ':' || epoch) AS shuffle_key FROM e)
       |SELECT epoch, source, shard_idx,
       |  CAST(row_number() OVER (PARTITION BY epoch
       |    ORDER BY shuffle_key, source, shard_idx) AS INT) AS position
       |FROM k ORDER BY epoch, position""".stripMargin

  /** e6: content-addressed blob dedup ledger, reduced to the per-source
    * storage-reclaim report (what a CAS-backed blob store dedupes): a
    * blob's canonical copy is the min doc_id holding its content hash;
    * every other reference is reclaimable. Per source: blob count,
    * total bytes, canonical count, reclaimable bytes, and the
    * integer-bp duplicate rate. ONE corpus scan → a hash-partitioned
    * min window (the only corpus-keyed exchange — equivalently the
    * groupBy(hash) ledger, kept at hash grain so canonical attribution
    * is exact cross-source) → a ≤|sources| reduce. The e1 text-as-blob
    * seam: a real binary column swaps in without a plan change. */
  def e6BlobDedup(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast("binary")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("content_md5"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(blob).as("content_md5"),
        octet_length(blob).cast("long").as("n_bytes"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L)).as("n_canonical"),
        sum(when(col("doc_id") =!= col("canonical_id"), col("n_bytes")).otherwise(0L))
          .as("reclaim_bytes"))
      .select(col("source"), col("n_blobs"), col("total_bytes"), col("n_canonical"),
        col("reclaim_bytes"),
        expr("((n_blobs - n_canonical) * 10000) div n_blobs").as("dup_bp"))
      .orderBy(col("source"))
  }

  val e6Sql: String =
    """WITH b AS (
      |  SELECT doc_id, source, md5(text) AS content_md5,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |c AS (
      |  SELECT *, min(doc_id) OVER (PARTITION BY content_md5) AS canonical_id FROM b),
      |s AS (
      |  SELECT source, count(*) AS n_blobs,
      |    CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |    CAST(sum(CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
      |    CAST(sum(CASE WHEN doc_id <> canonical_id THEN n_bytes ELSE 0 END) AS BIGINT) AS reclaim_bytes
      |  FROM c GROUP BY 1)
      |SELECT source, n_blobs, total_bytes, n_canonical, reclaim_bytes,
      |  ((n_blobs - n_canonical) * 10000) // n_blobs AS dup_bp
      |FROM s ORDER BY source""".stripMargin

  /** Aspect-ratio buckets for e8, as exact integer ratios (p:q = w:h).
    * 144 = lcm of the q's, so |w·q − h·p| · (144/q) is a single exact
    * integer sort key proportional to |w/h − p/q| (the common h·q
    * denominator scaled out) — bucket choice never touches a float. */
  val AspectBuckets: Seq[(Int, Int, String)] = Seq(
    (1, 2, "1:2"), (9, 16, "9:16"), (3, 4, "3:4"), (1, 1, "1:1"),
    (4, 3, "4:3"), (16, 9, "16:9"), (2, 1, "2:1"), (3, 1, "3:1"))

  /** Images per training batch for e8's batch-count report. */
  val BatchImages = 8L

  /** e8: aspect-ratio bucketing — the diffusion-training batching step
    * (public technique from NovelAI's aspect-ratio-bucketing writeup and
    * the SDXL report, arXiv:2307.01952): group images by the nearest
    * target aspect ratio so a batch never mixes shapes, then report per
    * bucket how many full batches an epoch yields and the leftover that
    * pads or drops. Nearest bucket = argmin over the fixed bucket list
    * of the exact integer distance key above; ties break to the earlier
    * bucket in the list (deterministic on any engine).
    *
    * Shape: bucket assignment is ROW-LOCAL — an `array_min` over a
    * compile-time literal array of (key, idx, ratio) structs
    * (lexicographic struct ordering), zero joins and zero shuffle on
    * the corpus path; the only exchange is the final ≤|buckets| reduce
    * with map-side partials. Rides e1's decoded-dimensions seam: a real
    * decoder swaps in without a plan change. */
  def e8AspectBuckets(spark: SparkSession, dir: String): DataFrame =
    e8AspectBucketsOf(e1MultimodalMeta(spark, dir))

  /** e8 over ANY (doc_id, width, height) frame — the decoded-dims
    * seam: the query entry feeds e1's stub meta, the [[PpmDecoder]]
    * spec feeds REAL measured dims through the same plan. */
  def e8AspectBucketsOf(meta: DataFrame): DataFrame = {
    val barr = array(AspectBuckets.zipWithIndex.map { case ((p, q, nm), i) =>
      struct(
        (abs(col("width") * q - col("height") * p) * (144 / q)).cast("long").as("k"),
        lit(i).as("i"), lit(nm).as("r"))
    }: _*)
    meta
      .select(col("doc_id"), array_min(barr).getField("r").as("ratio"))
      .groupBy(col("ratio"))
      .agg(count(lit(1)).as("n_imgs"))
      .select(col("ratio"), col("n_imgs"),
        expr(s"n_imgs div $BatchImages").as("n_batches"),
        expr(s"n_imgs % $BatchImages").as("leftover"))
      .orderBy(col("ratio"))
  }

  val e8Sql: String = {
    val vals = AspectBuckets.zipWithIndex
      .map { case ((p, q, nm), i) => s"($p, $q, '$nm', $i)" }.mkString(", ")
    s"""WITH img AS ($e1Sql),
       |bk(p, q, nm, i) AS (VALUES $vals),
       |rk AS (
       |  SELECT doc_id, nm, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY abs(width * q - height * p) * (144 // q), i) AS rn
       |  FROM img CROSS JOIN bk),
       |a AS (SELECT doc_id, nm AS ratio FROM rk WHERE rn = 1)
       |SELECT ratio, count(*) AS n_imgs,
       |  count(*) // $BatchImages AS n_batches,
       |  count(*) % $BatchImages AS leftover
       |FROM a GROUP BY ratio ORDER BY ratio""".stripMargin
  }

  /** e9: per-source modality-mix audit — the rebalancing report a
    * multimodal training run reads before setting sampling weights:
    * for each (source, modality), the blob count, the source-local
    * share, the corpus-wide share of that modality (the de-facto
    * target mix), and the signed delta — sources over/under-weighted
    * in a modality stand out as the rows to re-sample. Modality is
    * pseudo-decoded from doc_id (the e1 stub discipline: a real
    * pipeline reads it from sniffed container metadata; the plan is
    * identical).
    *
    * Shape: one scan → (source, modality) reduce; every share is a
    * window over the ≤ |sources|·3 reduced frame; exact basis points
    * throughout (share math in integers, never ratio doubles). */
  def e9ModalityMix(spark: SparkSession, dir: String): DataFrame = {
    // modulus 97 (prime, coprime to the doc_id stride): a power-of-10
    // modulus degenerates — 2654435761 ≡ 1 (mod 10), so doc_id·k mod 10
    // is just doc_id mod 10, constant within a source's interleaved ids.
    // doc_id is pre-reduced before the multiply (a28/VectorOps
    // discipline) — the raw product overflows int64 for ids ≥ ~3.5e9
    val mixHash = pmod(pmod(col("doc_id"), lit(97L)) * lit(2654435761L % 97L), lit(97L))
    val modality = when(mixHash < 58, lit("text"))
      .when(mixHash < 87, lit("image"))
      .otherwise(lit("audio"))
    val counts = Tables.documents(spark, dir)
      .select(col("source"), modality.as("modality"))
      .groupBy(col("source"), col("modality"))
      .agg(count(lit(1)).as("n_blobs"))
    val wSrc = Window.partitionBy(col("source"))
    val wMod = Window.partitionBy(col("modality"))
    val wAll = Window.partitionBy()
    counts
      .withColumn("src_total", sum(col("n_blobs")).over(wSrc))
      .withColumn("mod_total", sum(col("n_blobs")).over(wMod))
      .withColumn("all_total", sum(col("n_blobs")).over(wAll))
      .select(col("source"), col("modality"), col("n_blobs"),
        expr("(n_blobs * 10000) div src_total").as("src_bp"),
        expr("(mod_total * 10000) div all_total").as("global_bp"),
        expr("(n_blobs * 10000) div src_total - (mod_total * 10000) div all_total")
          .as("delta_bp"))
      .orderBy(col("source"), col("modality"))
  }

  val e9Sql: String =
    """WITH m AS (
      |  SELECT source,
      |    CASE WHEN ((doc_id % 97) * (2654435761 % 97)) % 97 < 58 THEN 'text'
      |         WHEN ((doc_id % 97) * (2654435761 % 97)) % 97 < 87 THEN 'image'
      |         ELSE 'audio' END AS modality
      |  FROM documents),
      |c AS (SELECT source, modality, count(*) AS n_blobs FROM m GROUP BY 1, 2),
      |w AS (
      |  SELECT *,
      |    CAST(sum(n_blobs) OVER (PARTITION BY source) AS BIGINT) AS src_total,
      |    CAST(sum(n_blobs) OVER (PARTITION BY modality) AS BIGINT) AS mod_total,
      |    CAST(sum(n_blobs) OVER () AS BIGINT) AS all_total
      |  FROM c)
      |SELECT source, modality, n_blobs,
      |  (n_blobs * 10000) // src_total AS src_bp,
      |  (mod_total * 10000) // all_total AS global_bp,
      |  (n_blobs * 10000) // src_total - (mod_total * 10000) // all_total AS delta_bp
      |FROM w ORDER BY source, modality""".stripMargin

  /** Fill threshold (basis points) below which e10 schedules a shard
    * for repacking. */
  val RepackFillBp = 5000L

  /** e10: shard repack plan — the small-files compaction pass at the
    * SHARD-MANIFEST grain (the multimodal sibling of a25's file
    * compaction): shards whose fill factor is below 50% of the budget
    * are paired greedily per source — emptiest with next-emptiest —
    * and each pair becomes one rewrite task with its combined fill.
    * Greedy pairing is expressed relationally: rank underfilled shards
    * by (fill, shard_idx) inside each source, pair = rank div 2 — a
    * deterministic, engine-portable pairing with no iterative bin
    * packer. An odd leftover shard pairs with nothing and is emitted
    * with partner −1 (kept as-is this cycle).
    *
    * Shape: rides e3's manifest (reduced frame ≤ shards); the only
    * work is a per-source window over that manifest — at 100 TB the
    * manifest is millions of rows where the data is billions, the
    * right grain for a planner. */
  def e10ShardRepack(spark: SparkSession, dir: String): DataFrame = {
    val under = e3ShardStats(spark, dir)
      .select(col("source"), col("shard_idx"), col("used_bytes"),
        expr(s"(used_bytes * 10000) div ${ShardBytes}L").as("fill_bp"))
      .filter(col("fill_bp") < RepackFillBp)
    under
      .withColumn("pair", expr("(row_number() OVER (PARTITION BY source ORDER BY fill_bp, shard_idx) - 1) div 2"))
      .groupBy(col("source"), col("pair"))
      .agg(min(col("shard_idx")).as("shard_a"),
        when(count(lit(1)) === 2, max(col("shard_idx"))).otherwise(lit(-1L)).as("shard_b"),
        sum(col("fill_bp")).as("combined_fill_bp"),
        sum(col("used_bytes")).as("combined_bytes"))
      .select(col("source"), col("shard_a"), col("shard_b"),
        col("combined_fill_bp"), col("combined_bytes"))
      .orderBy(col("source"), col("shard_a"))
  }

  val e10Sql: String =
    s"""WITH manifest AS ($e2Sql),
       |st AS (
       |  SELECT source, shard_idx, CAST(sum(n_bytes) AS BIGINT) AS used_bytes
       |  FROM manifest GROUP BY 1, 2),
       |under AS (
       |  SELECT source, shard_idx, used_bytes,
       |    (used_bytes * 10000) // $ShardBytes AS fill_bp
       |  FROM st WHERE (used_bytes * 10000) // $ShardBytes < $RepackFillBp),
       |ranked AS (
       |  SELECT *, (row_number() OVER (PARTITION BY source ORDER BY fill_bp, shard_idx) - 1) // 2 AS pair
       |  FROM under)
       |SELECT source, min(shard_idx) AS shard_a,
       |  CASE WHEN count(*) = 2 THEN max(shard_idx) ELSE -1 END AS shard_b,
       |  CAST(sum(fill_bp) AS BIGINT) AS combined_fill_bp,
       |  CAST(sum(used_bytes) AS BIGINT) AS combined_bytes
       |FROM ranked GROUP BY source, pair
       |ORDER BY source, shard_a""".stripMargin

  /** Minimum token count for an e11 training pair. */
  val PairMinTokens = 30L

  /** e11: contrastive-pair manifest — the text⨝embedding admission
    * gate a CLIP-style training run consumes: join the text corpus to
    * its embedding table (vec_id ≡ doc_id — the cross-modal key), gate
    * each pair on BOTH modalities (text length; embedding norm sanity
    * |‖v‖²−1| < 1%), and emit the keep/reject manifest. Norm math is
    * double-exact in both engines: each float element is cast to
    * double BEFORE squaring (a float32 square rounds differently) and
    * the left-to-right array fold order matches; only booleans and
    * integers are emitted, so no float ever reaches the hash.
    *
    * Shape: one fact-fact equi-join on the id key (un-hinted: both
    * sides corpus-sized at scale — SMJ with AQE; co-locate by
    * bucketing both tables on the id for the zero-exchange plan,
    * BucketedTables' seam). Row-local norm fold, no shuffle beyond
    * the join. */
  def e11PairManifest(spark: SparkSession, dir: String): DataFrame = {
    val norm2 = aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), size(TextOps.tokens(col("text"))).as("n_tokens"))
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), norm2.as("n2")),
        col("doc_id") === col("vec_id"))
      // the norm gate compares INTEGER-scaled rounded norms, not raw
      // doubles: Spark's aggregate() fold and DuckDB's list_sum may
      // differ in the last ulp, and a raw |n2-1| < 0.01 on a value one
      // ulp from the threshold would hash-diverge cross-engine
      .withColumn("norm_ok", abs(round(col("n2") * 10000).cast("long") - 10000L) < 100L)
      .select(col("doc_id"), col("lang"), col("n_tokens").cast("long").as("n_tokens"),
        col("norm_ok"),
        (col("norm_ok") && col("n_tokens") >= PairMinTokens).as("keep"))
      .orderBy(col("doc_id"))
  }

  val e11Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings),
       |d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, lang, n_tokens,
       |  abs(CAST(round(n2 * 10000) AS BIGINT) - 10000) < 100 AS norm_ok,
       |  abs(CAST(round(n2 * 10000) AS BIGINT) - 10000) < 100
       |    AND n_tokens >= $PairMinTokens AS keep
       |FROM d JOIN e ON doc_id = vec_id
       |ORDER BY doc_id""".stripMargin

  /** Data-loader worker count for e12 (the world size of a distributed
    * sampler; any W works — 4 exercises imbalance at test scale). */
  val LoaderWorkers = 4L

  /** e12: distributed-loader shard assignment — the step that turns
    * e7's per-epoch shard permutation into what each of W training
    * workers actually reads (the public DistributedSampler contract:
    * rank r takes positions ≡ r mod W of the epoch order). Per
    * (epoch, worker): shard count, assigned bytes (the LAST shard of a
    * source is partial — byte-exact via least(budget, total − offset),
    * e3's start-offset accounting), and the signed bp deviation from
    * the epoch's perfect per-worker byte share — the skew card that
    * says whether a slow-rank straggler is data imbalance or hardware.
    *
    * Shape: e7's layout arithmetic (one byte reduce per source, then
    * pure sequence expansion at the MANIFEST grain), the same
    * epoch-partitioned position window e7 prices, then a ≤|epochs|·W
    * reduce; the deviation window runs over that reduced frame. */
  /** The raw per-(shard, epoch) worker assignment e12 aggregates and
    * e24 self-joins across epochs — separated so the stability audit
    * provably reads the SAME placement rule the skew report does. */
  def e12AssignmentFrame(spark: SparkSession, dir: String): DataFrame = {
    val wEpoch = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"))
      .orderBy(col("shuffle_key"), col("source"), col("shard_idx"))
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(octet_length(col("text").cast("binary")).cast("long")).as("total_bytes"))
      .select(col("source"), col("total_bytes"), explode(expr(
        s"sequence(0L, (total_bytes + ${ShardBytes - 1}L) div ${ShardBytes}L - 1L)"))
        .as("shard_idx"))
      .withColumn("shard_bytes",
        least(lit(ShardBytes), col("total_bytes") - col("shard_idx") * ShardBytes))
      .select(col("source"), col("shard_idx"), col("shard_bytes"),
        explode(expr(s"sequence(0, ${Epochs - 1})")).as("epoch"))
      .withColumn("shuffle_key",
        md5(concat_ws(":", col("source"), col("shard_idx"), col("epoch"))))
      .withColumn("worker", pmod(row_number().over(wEpoch) - 1, lit(LoaderWorkers)))
  }

  def e12LoaderAssignment(spark: SparkSession, dir: String): DataFrame = {
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("epoch"))
    e12AssignmentFrame(spark, dir)
      .groupBy(col("epoch"), col("worker"))
      .agg(count(lit(1)).as("n_shards"), sum(col("shard_bytes")).as("assigned_bytes"))
      .withColumn("epoch_bytes", sum(col("assigned_bytes")).over(wTot))
      .select(col("epoch"), col("worker"), col("n_shards"), col("assigned_bytes"),
        expr(s"(assigned_bytes * $LoaderWorkers * 10000) div epoch_bytes - 10000")
          .as("skew_bp"))
      .orderBy(col("epoch"), col("worker"))
  }

  val e12Sql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       |  FROM documents GROUP BY 1),
       |shards AS (
       |  SELECT source, total_bytes,
       |    unnest(range(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes)) AS shard_idx
       |  FROM s),
       |sb AS (
       |  SELECT source, shard_idx,
       |    least($ShardBytes, total_bytes - shard_idx * $ShardBytes) AS shard_bytes
       |  FROM shards),
       |e AS (
       |  SELECT source, shard_idx, shard_bytes, unnest(range(0, $Epochs)) AS epoch FROM sb),
       |k AS (
       |  SELECT epoch, source, shard_idx, shard_bytes,
       |    md5(source || ':' || shard_idx || ':' || epoch) AS shuffle_key FROM e),
       |pos AS (
       |  SELECT epoch, shard_bytes,
       |    (row_number() OVER (PARTITION BY epoch
       |      ORDER BY shuffle_key, source, shard_idx) - 1) % $LoaderWorkers AS worker
       |  FROM k),
       |agg AS (
       |  SELECT epoch, worker, count(*) AS n_shards,
       |    CAST(sum(shard_bytes) AS BIGINT) AS assigned_bytes
       |  FROM pos GROUP BY 1, 2),
       |t AS (
       |  SELECT *, CAST(sum(assigned_bytes) OVER (PARTITION BY epoch) AS BIGINT) AS epoch_bytes
       |  FROM agg)
       |SELECT epoch, worker, n_shards, assigned_bytes,
       |  (assigned_bytes * $LoaderWorkers * 10000) // epoch_bytes - 10000 AS skew_bp
       |FROM t ORDER BY epoch, worker""".stripMargin

  /** e13: shard integrity checksums — the verification ledger a blob
    * pipeline publishes next to e2's shard manifest (a replica/transfer
    * is verified by comparing ledger rows, never by re-reading blobs
    * from the other side; WebDataset/tar-shard pipelines ship exactly
    * this sidecar). Per (source, shard): blob count, byte total, and an
    * ORDER-SENSITIVE rollup checksum — md5 over the doc_id-ordered
    * concatenation of per-blob content md5s, so a reordered, dropped,
    * duplicated or corrupted blob all change the shard digest.
    *
    * Shape: ONE corpus scan (e2's per-source cumsum window re-derived
    * with the content hash riding along — a join back to documents
    * would pay a second scan), then one (source, shard) reduce. The
    * collect_list is bounded by shard capacity (≤ ShardBytes/blob —
    * manifest-grain, not corpus-grain), and sort_array makes the fold
    * order deterministic at any parallelism; 32-hex md5s concatenate
    * below codegen string limits at any real shard size. */
  /** e13's checksum pipeline over ANY (doc_id, source, text) frame —
    * shared with e16's two-manifest diff. */
  private def shardChecksumsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("h"))
      .withColumn("end_byte", sum(col("n_bytes").cast("long")).over(w))
      .withColumn("start_byte", col("end_byte") - col("n_bytes"))
      .select(col("source"), expr(s"start_byte div $ShardBytes").as("shard_idx"),
        col("doc_id"), col("n_bytes"), col("h"))
      .groupBy(col("source"), col("shard_idx"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("n_bytes").cast("long")).as("shard_bytes"),
        md5(concat_ws("",
          transform(sort_array(collect_list(struct(col("doc_id"), col("h")))),
            p => p.getField("h"))).cast("binary")).as("shard_md5"))
  }

  def e13ShardChecksum(spark: SparkSession, dir: String): DataFrame =
    shardChecksumsOf(Tables.documents(spark, dir))
      .orderBy(col("source"), col("shard_idx"))

  val e13Sql: String =
    s"""WITH b AS (
       |  SELECT doc_id, source,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |    md5(text) AS h,
       |    CAST(sum(octet_length(encode(text)))
       |      OVER (PARTITION BY source ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_byte
       |  FROM documents)
       |SELECT source, (end_byte - n_bytes) // $ShardBytes AS shard_idx,
       |  CAST(count(*) AS BIGINT) AS n_blobs,
       |  CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       |  md5(string_agg(h, '' ORDER BY doc_id)) AS shard_md5
       |FROM b GROUP BY 1, 2 ORDER BY source, shard_idx""".stripMargin

  /** Pyramid floor for e14: levels halve until a side would drop
    * below this. */
  val PyramidMinSide = 64

  /** e14: resolution-ladder (mipmap/thumbnail pyramid) storage plan —
    * the precompute every image-serving + multi-res training pipeline
    * runs (progressive loading, low-res curriculum, augmentation at
    * native scales): per source, how many pyramid levels the corpus
    * generates and what the downscaled copies cost on top of the
    * originals. Level i halves both dims (integer `div`, the exact
    * arithmetic a real resizer's floor mode uses); levels exist while
    * both sides stay ≥ [[PyramidMinSide]]; bytes are priced at RGB
    * w·h·3 — the UNCOMPRESSED planning bound (codec output varies;
    * capacity planning uses the bound).
    *
    * Shape: rides e1's decode seam row-locally — a bounded
    * sequence-explode per image (≤ 6 levels at these dims; the d33
    * window-manifest idiom), then ONE ≤|sources| reduce. The classic
    * geometric-series check (pyramid ≈ ⅓ of original) falls out in
    * the overhead_bp column. */
  def e14ResolutionLadder(spark: SparkSession, dir: String): DataFrame =
    e14ResolutionLadderOf(e1MultimodalMeta(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id"))

  /** e14 over ANY (source, width, height) frame — the decoded-dims
    * seam ([[e8AspectBucketsOf]]'s twin; the [[PpmDecoder]] spec
    * reconciles the priced ladder against hand-computed levels). */
  def e14ResolutionLadderOf(meta: DataFrame): DataFrame = {
    val lvl = expr(
      s"""explode(filter(
         |  transform(sequence(0, 6),
         |    i -> named_struct(
         |      'level', cast(i as bigint),
         |      'w', cast(width as bigint) div shiftleft(1, i),
         |      'h', cast(height as bigint) div shiftleft(1, i))),
         |  s -> least(s.w, s.h) >= $PyramidMinSide))""".stripMargin)
    meta
      .select(col("source"), lvl.as("l"))
      .select(col("source"), col("l.level").as("level"),
        (col("l.w") * col("l.h") * lit(3L)).as("lvl_bytes"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("level") === 0, 1L).otherwise(0L)).as("n_images"),
        count(lit(1)).as("n_levels_total"),
        max(col("level")).as("max_level"),
        sum(when(col("level") === 0, col("lvl_bytes")).otherwise(0L)).as("orig_bytes"),
        sum(when(col("level") > 0, col("lvl_bytes")).otherwise(0L)).as("pyramid_bytes"))
      .select(col("source"), col("n_images"), col("n_levels_total"), col("max_level"),
        col("orig_bytes"), col("pyramid_bytes"),
        expr("(pyramid_bytes * 10000) div orig_bytes").as("overhead_bp"))
      .orderBy(col("source"))
  }

  val e14Sql: String =
    s"""WITH meta AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(640 + (ascii(substring(md5(d.text), 1, 1)) % 16) * 80 AS BIGINT) AS width,
       |    CAST(360 + (ascii(substring(md5(d.text), 2, 1)) % 16) * 45 AS BIGINT) AS height
       |  FROM documents d),
       |lv AS (
       |  SELECT doc_id, source, l.level AS level,
       |    l.w * l.h * 3 AS lvl_bytes
       |  FROM (
       |    SELECT doc_id, source,
       |      unnest(list_filter(
       |        list_transform(range(0, 7),
       |          i -> {'level': i, 'w': width // (1 << i), 'h': height // (1 << i)}),
       |        s -> least(s.w, s.h) >= $PyramidMinSide)) AS l
       |    FROM meta)),
       |a AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
       |    CAST(count(*) AS BIGINT) AS n_levels_total,
       |    CAST(max(level) AS BIGINT) AS max_level,
       |    CAST(sum(CASE WHEN level = 0 THEN lvl_bytes ELSE 0 END) AS BIGINT) AS orig_bytes,
       |    CAST(sum(CASE WHEN level > 0 THEN lvl_bytes ELSE 0 END) AS BIGINT) AS pyramid_bytes
       |  FROM lv GROUP BY source)
       |SELECT source, n_images, n_levels_total, max_level, orig_bytes, pyramid_bytes,
       |  (pyramid_bytes * 10000) // orig_bytes AS overhead_bp
       |FROM a ORDER BY source""".stripMargin

  /** e15: frame-sampling schedule at the manifest grain — the ORACLED
    * twin of the [[sampleFrames]] executor seam: exactly the
    * (frame_idx, offset, span) rows a [[StrideSampler]](256, 8) decode
    * pass will execute per blob, as a query over blob LENGTHS only.
    * This is the planning/execution split a 100 TB video pipeline
    * needs: the schedule (what to decode, how many batches, byte spans
    * to fetch) prices at the manifest grain and is exact — the codec
    * only ever executes it. n_frames = min(8, max(1, len div 256));
    * explode fans out ≤ 8 rows per BLOB row, never per byte. Spec
    * proves schedule ≡ the sampler's emitted (idx, offset) stream. */
  def e15FrameSamplePlan(spark: SparkSession, dir: String): DataFrame = {
    val len = octet_length(col("text").cast("binary"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), len.cast("long").as("n_bytes"))
      .withColumn("n_frames", least(lit(8L), greatest(lit(1L), expr("n_bytes div 256"))))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * 256).as("offset"),
        least(lit(256L), col("n_bytes") - col("frame_idx") * 256).as("span"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val e15Sql: String =
    """WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
      |n AS (
      |  SELECT doc_id, n_bytes,
      |    least(8, greatest(1, n_bytes // 256)) AS n_frames
      |  FROM b),
      |f AS (
      |  SELECT doc_id, n_bytes, n_frames,
      |    unnest(range(0, n_frames)) AS frame_idx
      |  FROM n)
      |SELECT doc_id, n_bytes, n_frames, frame_idx,
      |  frame_idx * 256 AS offset,
      |  least(256, n_bytes - frame_idx * 256) AS span
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** e16 revision rule: every 13th blob is deleted in snapshot B — a
    * deterministic stand-in for a curation pass between two dataset
    * versions (13 is coprime to the id stride, the e9 modulus lesson). */
  val SyncDropMod = 13

  /** e16: shard sync plan between two dataset snapshots — the
    * rsync/merkle question at shard grain ("version 2 of the dataset
    * exists; which tar shards must re-ship to the training cluster?").
    * Both snapshots run e13's order-sensitive checksum pipeline; a
    * FULL OUTER join on (source, shard_idx) classifies each shard:
    * `same` (checksum equal — skip), `changed` (re-ship B's bytes),
    * `removed` (A-only — delete remotely). The demo edit is a DELETION
    * precisely because greedy byte-offset sharding then SHIFTS every
    * later blob — the plan honestly shows the cascade (most shards
    * after the first edit re-ship), which is WHY content-defined
    * chunk boundaries (a30/e2's discussion) matter for sync-heavy
    * layouts; the operator measures the cost it plans around.
    *
    * Shape: two scans by design (two snapshots — a21's precedent; in
    * production B is a different table version), each reduced at
    * manifest grain; one (source, shard)-keyed full-outer SMJ of the
    * two ≤|shards| frames. */
  def e16ShardSyncPlan(spark: SparkSession, dir: String): DataFrame = {
    val a = shardChecksumsOf(Tables.documents(spark, dir))
      .select(col("source"), col("shard_idx"), col("shard_md5").as("md5_a"),
        col("shard_bytes").as("bytes_a"))
    val b = shardChecksumsOf(Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(SyncDropMod)) =!= 0))
      .select(col("source").as("source_b"), col("shard_idx").as("shard_b"),
        col("shard_md5").as("md5_b"), col("shard_bytes").as("bytes_b"))
    a.join(b, col("source") === col("source_b") && col("shard_idx") === col("shard_b"),
        "full_outer")
      .select(
        coalesce(col("source"), col("source_b")).as("source"),
        coalesce(col("shard_idx"), col("shard_b")).as("shard_idx"),
        when(col("md5_a").isNull, lit("added"))
          .when(col("md5_b").isNull, lit("removed"))
          .when(col("md5_a") === col("md5_b"), lit("same"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("bytes_b"), lit(0L)).as("ship_bytes"))
      .orderBy(col("source"), col("shard_idx"))
  }

  val e16Sql: String =
    s"""WITH ca AS (
       |  SELECT source, (end_byte - n_bytes) // $ShardBytes AS shard_idx,
       |    md5(string_agg(h, '' ORDER BY doc_id)) AS md5_a,
       |    CAST(sum(n_bytes) AS BIGINT) AS bytes_a
       |  FROM (
       |    SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |      md5(text) AS h,
       |      CAST(sum(octet_length(encode(text))) OVER (PARTITION BY source ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_byte
       |    FROM documents)
       |  GROUP BY 1, 2),
       |cb AS (
       |  SELECT source, (end_byte - n_bytes) // $ShardBytes AS shard_idx,
       |    md5(string_agg(h, '' ORDER BY doc_id)) AS md5_b,
       |    CAST(sum(n_bytes) AS BIGINT) AS bytes_b
       |  FROM (
       |    SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |      md5(text) AS h,
       |      CAST(sum(octet_length(encode(text))) OVER (PARTITION BY source ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_byte
       |    FROM documents WHERE doc_id % $SyncDropMod <> 0)
       |  GROUP BY 1, 2)
       |SELECT coalesce(ca.source, cb.source) AS source,
       |  coalesce(ca.shard_idx, cb.shard_idx) AS shard_idx,
       |  CASE WHEN ca.md5_a IS NULL THEN 'added'
       |       WHEN cb.md5_b IS NULL THEN 'removed'
       |       WHEN ca.md5_a = cb.md5_b THEN 'same'
       |       ELSE 'changed' END AS status,
       |  coalesce(cb.bytes_b, 0) AS ship_bytes
       |FROM ca FULL OUTER JOIN cb
       |  ON ca.source = cb.source AND ca.shard_idx = cb.shard_idx
       |ORDER BY source, shard_idx""".stripMargin

  /** Loader-fleet size for e21's rendezvous placement (and the +1
    * elasticity probe). 16 mirrors a modest reader tier; the MATH is
    * what scales — HRW is O(shards × nodes) with no coordination
    * state, the standard cache/loader placement since Thaler &
    * Ravishankar 1998. */
  val PlacementNodes = 16

  def e21RendezvousPlacement(spark: SparkSession, dir: String): DataFrame = {
    val n = PlacementNodes
    // e12's shard derivation: per-source byte totals -> ceil-div shard
    // spine. One corpus scan; everything after is shard-grain (slim:
    // corpus_bytes / ShardBytes rows - ~100k at 100 TB with 1 GiB
    // shards, trivially repartitionable).
    val owners = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(octet_length(col("text").cast("binary")).cast("long")).as("total_bytes"))
      .select(col("source"), explode(expr(
        s"sequence(0L, (total_bytes + ${ShardBytes - 1}L) div ${ShardBytes}L - 1L)"))
        .as("shard_idx"))
      .select(col("source"), col("shard_idx"),
        explode(expr(s"sequence(0, $n)")).as("node"))
      .withColumn("wt", md5(concat_ws(":", col("source"), col("shard_idx"), col("node"))))
      .groupBy(col("source"), col("shard_idx"))
      .agg(
        max(when(col("node") < n, struct(col("wt"), col("node")))).as("s16"),
        max(struct(col("wt"), col("node"))).as("s17"))
      .select(col("s16.node").as("o16"), col("s17.node").as("o17"))
    // (o16, o17) pair counts are <= nodes x 2 rows (HRW: the owner
    // changes ONLY if the new node wins) - then both per-node roles
    // ride ONE lineage via a role explode, no join-back, no second scan
    val spine = spark.range(n + 1).select(col("id").as("node"))
    spine.join(
      owners.groupBy(col("o16"), col("o17")).agg(count(lit(1)).as("cnt"))
        .select(explode(array(
          struct(col("o16").as("node"), col("cnt").as("c16"),
            lit(0L).as("c17"), lit(0L).as("mov")),
          struct(col("o17").as("node"), lit(0L).as("c16"),
            col("cnt").as("c17"),
            when(col("o16") =!= col("o17"), col("cnt")).otherwise(lit(0L)).as("mov"))))
          .as("r"))
        .groupBy(col("r.node").as("node"))
        .agg(sum(col("r.c16")).as("s16"), sum(col("r.c17")).as("s17"),
          sum(col("r.mov")).as("smov")),
      Seq("node"), "left")
      .select(col("node"), coalesce(col("s16"), lit(0L)).as("n_shards_16"),
        coalesce(col("s17"), lit(0L)).as("n_shards_17"),
        coalesce(col("smov"), lit(0L)).as("moved_in"))
      .orderBy(col("node"))
  }

  /** e21: rendezvous (highest-random-weight) shard->loader placement
    * with an elasticity audit — the placement policy e12's round-robin
    * is NOT: modulo assignment reshuffles nearly every shard when the
    * fleet grows by one, while HRW provably moves only the shards the
    * NEW node wins (~1/(N+1) of them) and nothing else. Per shard, the
    * owner is argmax over nodes of md5(source:shard:node); the query
    * reports each node's shard count at N=16, at N=17, and the
    * moved-in count — the spec asserts every move lands on the new
    * node and the moved fraction is near 1/17. Stateless, per-shard
    * parallel, no coordination — the 1000-loader fleet shape. */
  val e21Sql: String = {
    val n = PlacementNodes
    s"""WITH totals AS (
       |  SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       |  FROM documents GROUP BY 1),
       |shards AS (
       |  SELECT source,
       |    unnest(generate_series(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes - 1))
       |      AS shard_idx
       |  FROM totals),
       |h AS (
       |  SELECT source, shard_idx, node,
       |    md5(source || ':' || CAST(shard_idx AS VARCHAR) || ':' || CAST(node AS VARCHAR)) AS wt
       |  FROM (SELECT source, shard_idx, unnest(generate_series(0, $n)) AS node FROM shards)),
       |own AS (
       |  SELECT source, shard_idx,
       |    arg_max(node, wt) FILTER (WHERE node < $n) AS o16,
       |    arg_max(node, wt) AS o17
       |  FROM h GROUP BY 1, 2),
       |pairs AS (SELECT o16, o17, count(*) AS cnt FROM own GROUP BY 1, 2),
       |roles AS (
       |  SELECT o16 AS node, cnt AS c16, 0 AS c17, 0 AS mov FROM pairs
       |  UNION ALL
       |  SELECT o17, 0, cnt, CASE WHEN o16 <> o17 THEN cnt ELSE 0 END FROM pairs),
       |agg AS (
       |  SELECT node, sum(c16) AS s16, sum(c17) AS s17, sum(mov) AS smov
       |  FROM roles GROUP BY 1)
       |SELECT s.node, CAST(coalesce(agg.s16, 0) AS BIGINT) AS n_shards_16,
       |  CAST(coalesce(agg.s17, 0) AS BIGINT) AS n_shards_17,
       |  CAST(coalesce(agg.smov, 0) AS BIGINT) AS moved_in
       |FROM (SELECT unnest(generate_series(0, $n)) AS node) s
       |LEFT JOIN agg ON s.node = agg.node
       |ORDER BY s.node""".stripMargin
  }

  def e22ScheduleMixing(spark: SparkSession, dir: String): DataFrame =
    e22ScheduleMixingOf(e7EpochSchedule(spark, dir))

  /** e22: epoch-schedule mixing audit — is e7's shuffled shard order
    * actually WELL-MIXED, or does a dominant source still arrive in
    * runs? Correlated batches are the failure mode epoch shuffling
    * exists to prevent (gradient noise collapses when consecutive
    * steps see one source), so the audit a training job runs on its
    * schedule: per epoch, observed source-switch count vs the EXACT
    * expected switches of a uniform random permutation of the same
    * source multiset — E = (n−1) − Σc_s(c_s−1)/n, a rational with no
    * distributional hand-waving — plus the longest same-source run
    * (the worst correlated stretch a loader will see). mixing_ok
    * gates at ≥90% of expected (md5-shuffle should sit at ~100%;
    * a sorted schedule craters to ~k/expected).
    *
    * All-integer: expected is milli-truncated via exact DECIMAL(38,0)
    * floor-division (q73 idiom), the gate cross-multiplies — no
    * floats anywhere. Run-length encoding rides lag + cumsum windows;
    * per-source counts REGROUP from the run-level frame (c_s = Σ run
    * lengths), so the whole audit is a single lineage over the
    * schedule — no second consumer, no checkpoint.
    *
    * Shape: e7's schedule build (one scan, bounded shards×epochs
    * frame) → two epoch-partitioned windows → run reduce → source
    * reduce → per-epoch 1-row. */
  def e22ScheduleMixingOf(sched: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    def fdiv(a: Column, b: Column): Column =
      ((a - (a % b)) / b).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val wOrd = Window.partitionBy(col("epoch")).orderBy(col("position"))
    val runs = sched
      .withColumn("prev", lag(col("source"), 1).over(wOrd))
      .withColumn("new_run",
        when(col("prev").isNull || col("prev") =!= col("source"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("new_run")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("epoch"), col("run_id"), col("source"))
      .agg(count(lit(1)).as("len"))
    val perSrc = runs.groupBy(col("epoch"), col("source"))
      .agg(sum(col("len")).as("c"), count(lit(1)).as("nr"), max(col("len")).as("ml"))
    perSrc.groupBy(col("epoch"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
        sum(col("nr")).as("n_runs"), max(col("ml")).as("longest"),
        sum(d38(col("c")) * (col("c") - 1)).as("sumc2"))
      .withColumn("exp_milli",
        fdiv(d38(lit(1000)) * (col("n") - 1) * col("n") - d38(col("sumc2")) * 1000,
          d38(col("n"))))
      .select(col("epoch"), col("n").cast("bigint").as("n_shards"),
        col("k").cast("bigint").as("n_sources"),
        col("n_runs").cast("bigint").as("n_runs"),
        (col("n_runs") - 1).cast("bigint").as("n_switches"),
        col("longest").cast("bigint").as("longest_run"),
        col("exp_milli").cast("bigint").as("expected_switches_milli"),
        (d38(col("n_runs") - 1) * 10000 >= col("exp_milli") * 9).as("mixing_ok"))
      .orderBy(col("epoch"))
  }

  val e22Sql: String =
    s"""WITH sched AS (
       |${e7Sql}
       |),
       |r AS (
       |  SELECT epoch, source, position,
       |    CASE WHEN lag(source) OVER (PARTITION BY epoch ORDER BY position)
       |      IS DISTINCT FROM source THEN 1 ELSE 0 END AS new_run
       |  FROM sched),
       |rid AS (
       |  SELECT epoch, source,
       |    sum(new_run) OVER (PARTITION BY epoch ORDER BY position
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
       |  FROM r),
       |runs AS (
       |  SELECT epoch, run_id, source, CAST(count(*) AS BIGINT) AS len
       |  FROM rid GROUP BY 1, 2, 3),
       |per_src AS (
       |  SELECT epoch, source, sum(len) AS c, count(*) AS nr, max(len) AS ml
       |  FROM runs GROUP BY 1, 2),
       |g AS (
       |  SELECT epoch, sum(c) AS n, count(*) AS k, sum(nr) AS n_runs,
       |    max(ml) AS longest, sum(CAST(c AS HUGEINT) * (c - 1)) AS sumc2
       |  FROM per_src GROUP BY 1)
       |SELECT epoch, CAST(n AS BIGINT) AS n_shards, CAST(k AS BIGINT) AS n_sources,
       |  CAST(n_runs AS BIGINT) AS n_runs,
       |  CAST(n_runs - 1 AS BIGINT) AS n_switches,
       |  CAST(longest AS BIGINT) AS longest_run,
       |  CAST((1000 * (CAST(n AS HUGEINT) - 1) * n - 1000 * sumc2) // n AS BIGINT)
       |    AS expected_switches_milli,
       |  CAST(n_runs - 1 AS HUGEINT) * 10000 >=
       |    ((1000 * (CAST(n AS HUGEINT) - 1) * n - 1000 * sumc2) // n) * 9 AS mixing_ok
       |FROM g ORDER BY epoch""".stripMargin

  /** e23 byte-range coalescing: gap tolerance (bytes) and the sampled
    * fetch-set rule (every 3rd doc — a partial-epoch read). With
    * ~1–1.5 KB framed members, skipping two of three leaves ~2–3 KB
    * gaps, so the tolerance genuinely splits decisions both ways. */
  val CoalesceGap = 3072L
  val FetchEvery = 3L

  /** e23: byte-range COALESCING plan for a partial shard read — the
    * request schedule a WebDataset/S3 loader actually issues when an
    * epoch needs a SUBSET of each archive's members (sampled epochs,
    * resumed epochs, modality filters): adjacent wanted members whose
    * gap (skipped members' framed bytes) is ≤ the tolerance merge into
    * ONE range request — trading wasted bytes for round-trips, the
    * classic object-store read optimization (S3 range GETs bill per
    * request AND per byte; the gap tolerance is the knob). Per
    * (source, shard): requests issued, bytes actually wanted, bytes
    * read including coalesced waste, and the waste share in bp. Fetch
    * set = every 3rd doc_id — deterministic, so the oracle prices the
    * identical plan. All integer; e17's framing math is the input.
    *
    * Shape: e17's manifest lineage (slim window math, no payloads) →
    * filter to the fetch set → ONE per-shard ordered window (lag of
    * member end) → shard-grain reduce. */
  def e23ReadCoalesce(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wanted = e17LayoutFrame(spark, dir)
      .filter(pmod(col("doc_id"), lit(FetchEvery)) === 0)
      .select(col("source"), col("shard_idx"), col("doc_id"),
        col("member_offset"), col("framed_bytes"))
    val w = Window.partitionBy(col("source"), col("shard_idx"))
      .orderBy(col("member_offset"))
    wanted
      .withColumn("prev_end",
        lag(col("member_offset") + col("framed_bytes"), 1).over(w))
      .withColumn("gap", col("member_offset") - col("prev_end"))
      // a new range request starts at the first member and at every
      // gap beyond the tolerance; a coalesced gap is read as waste
      .withColumn("starts_request",
        when(col("prev_end").isNull || col("gap") > CoalesceGap, 1L).otherwise(0L))
      .withColumn("waste",
        when(col("prev_end").isNotNull && col("gap") <= CoalesceGap, col("gap"))
          .otherwise(0L))
      .groupBy(col("source"), col("shard_idx"))
      .agg(count(lit(1)).as("n_members_fetched"),
        sum(col("starts_request")).as("n_requests"),
        sum(col("framed_bytes")).as("bytes_wanted"),
        (sum(col("framed_bytes")) + sum(col("waste"))).as("bytes_read"))
      .select(col("source"), col("shard_idx"), col("n_members_fetched"),
        col("n_requests"), col("bytes_wanted"), col("bytes_read"),
        expr("((bytes_read - bytes_wanted) * 10000) div bytes_read").as("waste_bp"))
      .orderBy(col("source"), col("shard_idx"))
  }

  val e23Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents),
       |laid AS (
       |  SELECT *, sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes AS start_byte
       |  FROM sized),
       |sharded AS (
       |  SELECT doc_id, source, n_bytes,
       |    CAST(start_byte // $ShardBytes AS BIGINT) AS shard_idx,
       |    512 + ((n_bytes + 511) // 512) * 512 AS framed_bytes
       |  FROM laid),
       |off AS (
       |  SELECT *, sum(framed_bytes) OVER (PARTITION BY source, shard_idx ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - framed_bytes AS member_offset
       |  FROM sharded),
       |wanted AS (
       |  SELECT source, shard_idx, doc_id, member_offset, framed_bytes
       |  FROM off WHERE doc_id % $FetchEvery = 0),
       |gaps AS (
       |  SELECT *,
       |    lag(member_offset + framed_bytes) OVER (PARTITION BY source, shard_idx
       |      ORDER BY member_offset) AS prev_end
       |  FROM wanted),
       |marked AS (
       |  SELECT source, shard_idx, framed_bytes,
       |    CASE WHEN prev_end IS NULL OR member_offset - prev_end > $CoalesceGap
       |      THEN 1 ELSE 0 END AS starts_request,
       |    CASE WHEN prev_end IS NOT NULL AND member_offset - prev_end <= $CoalesceGap
       |      THEN member_offset - prev_end ELSE 0 END AS waste
       |  FROM gaps)
       |SELECT source, shard_idx,
       |  CAST(count(*) AS BIGINT) AS n_members_fetched,
       |  CAST(sum(starts_request) AS BIGINT) AS n_requests,
       |  CAST(sum(framed_bytes) AS BIGINT) AS bytes_wanted,
       |  CAST(sum(framed_bytes) + sum(waste) AS BIGINT) AS bytes_read,
       |  CAST(((sum(framed_bytes) + sum(waste) - sum(framed_bytes)) * 10000)
       |    // (sum(framed_bytes) + sum(waste)) AS BIGINT) AS waste_bp
       |FROM marked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def e24EpochStability(spark: SparkSession, dir: String): DataFrame = {
    val a = e12AssignmentFrame(spark, dir)
      .select(col("source"), col("shard_idx"), col("shard_bytes"),
        col("epoch"), col("worker"))
      .localCheckpoint(true)
    val b = a.select(col("source").as("b_source"), col("shard_idx").as("b_idx"),
      col("epoch").as("b_epoch"), col("worker").as("b_worker"))
    a.join(b, col("source") === col("b_source") &&
        col("shard_idx") === col("b_idx") &&
        col("b_epoch") === col("epoch") + 1)
      .groupBy(col("epoch").as("epoch_from"))
      .agg(count(lit(1)).as("n_shards"),
        count(when(col("worker") === col("b_worker"), 1)).as("stayed"),
        sum(col("shard_bytes")).as("total_bytes"),
        sum(when(col("worker") === col("b_worker"), col("shard_bytes"))
          .otherwise(lit(0L))).as("stayed_bytes"))
      .select(col("epoch_from"), col("n_shards"), col("stayed"),
        expr("(stayed * 10000) div n_shards").as("stay_bp"),
        expr("(stayed_bytes * 10000) div total_bytes").as("stay_bytes_bp"))
      .orderBy(col("epoch_from"))
  }

  /** e24 scaladoc (see method above): loader-assignment STABILITY
    * across consecutive epochs — the page-cache/NVMe reuse question
    * e12's per-epoch skew report cannot answer: of epoch e's shards,
    * how many land on the SAME worker in epoch e+1? e7/e22 exist to
    * make epochs decorrelated, so the EXPECTED stay share is ~1/W —
    * a loader fleet that wants cache reuse pins placement (e21
    * rendezvous) instead, and this audit is the number that decides
    * which trade you are making. Reads the exact e12 placement rule
    * (shared `e12AssignmentFrame`); the checkpointed shard×epoch frame
    * self-joins at (shard, epoch+1) — value grain, no corpus scan. */
  val e24Sql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       |  FROM documents GROUP BY 1),
       |shards AS (
       |  SELECT source, total_bytes,
       |    unnest(range(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes)) AS shard_idx
       |  FROM s),
       |sb AS (
       |  SELECT source, shard_idx,
       |    least($ShardBytes, total_bytes - shard_idx * $ShardBytes) AS shard_bytes
       |  FROM shards),
       |e AS (
       |  SELECT source, shard_idx, shard_bytes, unnest(range(0, $Epochs)) AS epoch FROM sb),
       |k AS (
       |  SELECT epoch, source, shard_idx, shard_bytes,
       |    md5(source || ':' || shard_idx || ':' || epoch) AS shuffle_key FROM e),
       |pos AS (
       |  SELECT epoch, source, shard_idx, shard_bytes,
       |    (row_number() OVER (PARTITION BY epoch
       |      ORDER BY shuffle_key, source, shard_idx) - 1) % $LoaderWorkers AS worker
       |  FROM k),
       |j AS (
       |  SELECT a.epoch AS epoch_from, a.shard_bytes,
       |    CASE WHEN a.worker = b.worker THEN 1 ELSE 0 END AS stayed
       |  FROM pos a JOIN pos b
       |    ON a.source = b.source AND a.shard_idx = b.shard_idx
       |    AND b.epoch = a.epoch + 1)
       |SELECT epoch_from, CAST(count(*) AS BIGINT) AS n_shards,
       |  CAST(sum(stayed) AS BIGINT) AS stayed,
       |  CAST((sum(stayed) * 10000) // count(*) AS BIGINT) AS stay_bp,
       |  CAST((sum(CASE WHEN stayed = 1 THEN shard_bytes ELSE 0 END) * 10000)
       |    // sum(shard_bytes) AS BIGINT) AS stay_bytes_bp
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** e25: mid-epoch RESUME plan — the checkpoint-restart schedule a
    * crashed training loader derives before touching a byte (torchdata
    * / WebDataset resumable loading: a run dies at global item step S
    * inside an epoch; re-reading finished shards wastes exactly the
    * bandwidth the shard layout exists to save): walk e7's epoch-1
    * shard order (same salted-md5 permutation — the resume plan MUST
    * agree with the schedule the loader was executing), accumulate
    * per-shard item counts from e2's layout, and classify every shard
    * against S = 40% of the epoch's items: `done` (cum_end ≤ S —
    * skip), `partial` (the one shard straddling S, with the in-shard
    * item offset to seek to), `pending` (untouched). Empty shards a
    * long blob can strand (no member STARTS inside) still schedule —
    * the spine comes from byte totals, not observed starts, exactly
    * as e7's loader-side set does.
    *
    * Shape: ONE corpus scan (e2's per-source cumsum on the slim
    * frame) → shard-grain reduce, localCheckpoint'ed (spine totals
    * and the item join must not re-run the corpus window per branch)
    * → spine explode + manifest-grain schedule windows. Output is
    * manifest-grain (the e2/e7 convention). */
  def e25ResumePlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shards = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .withColumn("end_byte", sum(col("n_bytes")).over(wSrc))
      .withColumn("start_byte", col("end_byte") - col("n_bytes"))
      .select(col("source"), expr(s"start_byte div $ShardBytes").as("shard_idx"),
        col("end_byte"))
      .groupBy(col("source"), col("shard_idx"))
      .agg(count(lit(1)).as("n_items"), max(col("end_byte")).as("max_end"))
      .localCheckpoint()
    val spine = shards.groupBy(col("source"))
      .agg(max(col("max_end")).as("total_bytes"))
      .select(col("source"), explode(expr(
        s"sequence(0L, (total_bytes + ${ShardBytes - 1}L) div ${ShardBytes}L - 1L)"))
        .as("shard_idx"))
    val wOrd = Window.orderBy(col("shuffle_key"), col("source"), col("shard_idx"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    spine
      .join(shards.select(col("source"), col("shard_idx"), col("n_items")),
        Seq("source", "shard_idx"), "left")
      .na.fill(0L, Seq("n_items"))
      .withColumn("shuffle_key",
        md5(concat_ws(":", col("source"), col("shard_idx"), lit(1))))
      .withColumn("position", row_number().over(wOrd))
      .withColumn("cum_end", sum(col("n_items")).over(wCum))
      .withColumn("cum_start", col("cum_end") - col("n_items"))
      .withColumn("s", expr("sum(n_items) over () * 2 div 5"))
      .select(col("position"), col("source"), col("shard_idx"), col("n_items"),
        when(col("cum_end") <= col("s"), lit("done"))
          .when(col("cum_start") >= col("s"), lit("pending"))
          .otherwise(lit("partial")).as("status"),
        when(col("cum_end") > col("s") && col("cum_start") < col("s"),
          col("s") - col("cum_start")).as("resume_offset"))
      .orderBy(col("position"))
  }

  val e25Sql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source, octet_length(encode(text)) AS n_bytes FROM documents),
       |cum AS (
       |  SELECT source,
       |    (sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes)
       |      // $ShardBytes AS shard_idx,
       |    sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_byte
       |  FROM docs),
       |per AS (
       |  SELECT source, shard_idx, count(*) AS n_items, max(end_byte) AS max_end
       |  FROM cum GROUP BY 1, 2),
       |tot AS (
       |  SELECT source, CAST(max(max_end) AS BIGINT) AS total_bytes FROM per GROUP BY 1),
       |spine AS (
       |  SELECT source,
       |    unnest(range(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes)) AS shard_idx
       |  FROM tot),
       |sched AS (
       |  SELECT s.source, s.shard_idx, coalesce(p.n_items, 0) AS n_items,
       |    md5(s.source || ':' || s.shard_idx || ':' || 1) AS shuffle_key
       |  FROM spine s LEFT JOIN per p USING (source, shard_idx)),
       |pos AS (
       |  SELECT source, shard_idx, n_items,
       |    CAST(row_number() OVER (ORDER BY shuffle_key, source, shard_idx) AS INT)
       |      AS position,
       |    sum(n_items) OVER (ORDER BY shuffle_key, source, shard_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end,
       |    sum(n_items) OVER () * 2 // 5 AS s
       |  FROM sched)
       |SELECT position, source, shard_idx, CAST(n_items AS BIGINT) AS n_items,
       |  CASE WHEN cum_end <= s THEN 'done'
       |       WHEN cum_end - n_items >= s THEN 'pending'
       |       ELSE 'partial' END AS status,
       |  CASE WHEN cum_end > s AND cum_end - n_items < s
       |       THEN CAST(s - (cum_end - n_items) AS BIGINT) END AS resume_offset
       |FROM pos ORDER BY position""".stripMargin

  /** e26: byte-budgeted PARTIAL-epoch sampling plan — the sub-epoch
    * training schedule when the corpus is bigger than an epoch's
    * compute budget (common at 100 TB: each "epoch" may only afford
    * 40% of the bytes): per epoch, walk e7's salted-md5 shard order
    * and admit shards while the byte budget holds (deterministic, no
    * coordinator state — any worker recomputes the same plan), then
    * report the question that decides whether this sampling is SOUND:
    * cumulative corpus coverage — after E budgeted epochs, what byte
    * share of the corpus has been seen at least once? Decorrelated
    * per-epoch orders (e7's property) make coverage climb toward 1 −
    * (1−b)^E; a correlated schedule would resample the same prefix
    * and starve the tail, which is exactly what this audit exposes.
    *
    * Shape: ONE corpus scan (per-source byte totals) → shard spine at
    * manifest grain, localCheckpoint'ed → epoch explode + per-epoch
    * cumsum windows → selection stats and first-seen coverage both
    * reduced from the SAME selected frame. All integer. */
  def e26ByteBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(octet_length(col("text").cast("binary")).cast("long")).as("total_bytes"))
      .select(col("source"), col("total_bytes"), explode(expr(
        s"sequence(0L, (total_bytes + ${ShardBytes - 1}L) div ${ShardBytes}L - 1L)"))
        .as("shard_idx"))
      .select(col("source"), col("shard_idx"),
        least(lit(ShardBytes), col("total_bytes") - col("shard_idx") * ShardBytes)
          .as("shard_bytes"))
      .localCheckpoint()
    val wEpoch = Window.partitionBy(col("epoch"))
      .orderBy(col("shuffle_key"), col("source"), col("shard_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("epoch"))
    val sel = shards
      .select(col("source"), col("shard_idx"), col("shard_bytes"),
        explode(expr(s"sequence(0, ${Epochs - 1})")).as("epoch"))
      .withColumn("shuffle_key",
        md5(concat_ws(":", col("source"), col("shard_idx"), col("epoch"))))
      .withColumn("cum", sum(col("shard_bytes")).over(wEpoch))
      .withColumn("total", sum(col("shard_bytes")).over(wTot))
      .filter(col("cum") <= expr("total * 2 div 5"))
      .localCheckpoint()
    val perEpoch = sel.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_shards"), sum(col("shard_bytes")).as("epoch_bytes"),
        max(col("total")).as("total_bytes"))
    val coverage = sel.groupBy(col("source"), col("shard_idx"))
      .agg(min(col("epoch")).as("first_epoch"), max(col("shard_bytes")).as("b"))
      .select(col("b"), explode(expr(s"sequence(first_epoch, ${Epochs - 1})")).as("epoch"))
      .groupBy(col("epoch"))
      .agg(sum(col("b")).as("seen_bytes"))
    perEpoch.join(coverage, Seq("epoch"))
      .select(col("epoch"), col("n_shards"), col("epoch_bytes"),
        expr("(epoch_bytes * 10000) div total_bytes").as("budget_used_bp"),
        expr("(seen_bytes * 10000) div total_bytes").as("coverage_bp"))
      .orderBy(col("epoch"))
  }

  val e26Sql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       |  FROM documents GROUP BY 1),
       |shards AS (
       |  SELECT source, total_bytes,
       |    unnest(range(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes)) AS shard_idx
       |  FROM s),
       |sb AS (
       |  SELECT source, shard_idx,
       |    least($ShardBytes, total_bytes - shard_idx * $ShardBytes) AS shard_bytes
       |  FROM shards),
       |e AS (
       |  SELECT source, shard_idx, shard_bytes, unnest(range(0, $Epochs)) AS epoch FROM sb),
       |k AS (
       |  SELECT *, md5(source || ':' || shard_idx || ':' || epoch) AS shuffle_key FROM e),
       |c AS (
       |  SELECT *,
       |    sum(shard_bytes) OVER (PARTITION BY epoch
       |      ORDER BY shuffle_key, source, shard_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(shard_bytes) OVER (PARTITION BY epoch) AS total
       |  FROM k),
       |sel AS (SELECT * FROM c WHERE cum <= total * 2 // 5),
       |pe AS (
       |  SELECT epoch, count(*) AS n_shards, sum(shard_bytes) AS epoch_bytes,
       |    max(total) AS total_bytes
       |  FROM sel GROUP BY 1),
       |firsts AS (
       |  SELECT source, shard_idx, min(epoch) AS first_epoch,
       |    max(shard_bytes) AS b
       |  FROM sel GROUP BY 1, 2),
       |cov AS (
       |  SELECT e2 AS epoch, sum(b) AS seen_bytes
       |  FROM (SELECT b, unnest(range(first_epoch, $Epochs)) AS e2 FROM firsts)
       |  GROUP BY 1)
       |SELECT pe.epoch, CAST(n_shards AS BIGINT) AS n_shards,
       |  CAST(epoch_bytes AS BIGINT) AS epoch_bytes,
       |  CAST((epoch_bytes * 10000) // total_bytes AS BIGINT) AS budget_used_bp,
       |  CAST((seen_bytes * 10000) // total_bytes AS BIGINT) AS coverage_bp
       |FROM pe JOIN cov ON pe.epoch = cov.epoch
       |ORDER BY pe.epoch""".stripMargin

  /** e27: cross-modality PAIR LOCALITY — when a text stream and its
    * paired embedding/image stream are sharded independently (each
    * packed in the SAME (source, doc_id) order, the paired-modality
    * WebDataset layout), a loader can walk both with one open shard
    * per modality ONLY while the pair's two halves sit at the same
    * shard ordinal; byte-size skew between modalities makes the
    * ordinals drift, and every drifted pair is a random seek at
    * training time. This prices that: modality B's per-source budget
    * is derived so B has the SAME shard count as A (budget =
    * ceil(B-bytes / A's shard count) — alignment is achievable, drift
    * is therefore pure interleaving skew), then per source: pairs,
    * shards, pairs whose ordinals match, and the worst ordinal drift.
    * Exact integer bytes/cumsums/divs end-to-end.
    *
    * Shape: one docs⋈embeddings equi-join to pair grain, TWO running
    * sums over the same per-source window (one pass), a ≤|sources|
    * totals broadcast back, one reduce. The window is pair-grain
    * (ids + 2 byte counts), never blob payloads. */
  def e27PairLocality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pairs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("tb"))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id"), (size(col("embedding")) * 4L).cast("long").as("eb")),
        col("doc_id") === col("vec_id"))
      .withColumn("t_start", sum(col("tb")).over(w) - col("tb"))
      .withColumn("e_start", sum(col("eb")).over(w) - col("eb"))
      .localCheckpoint()
    val b2 = pairs.groupBy(col("source"))
      .agg(sum(col("tb")).as("ttot"), sum(col("eb")).as("etot"))
      .withColumn("n_shards", expr(s"(ttot + ${ShardBytes - 1}L) div ${ShardBytes}L"))
      .withColumn("e_budget", expr("(etot + n_shards - 1) div n_shards"))
      .select(col("source"), col("n_shards"), col("e_budget"))
    pairs.join(broadcast(b2), Seq("source"))
      .withColumn("t_shard", expr(s"t_start div ${ShardBytes}L"))
      .withColumn("e_shard", expr("e_start div e_budget"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        max(col("n_shards")).cast("bigint").as("n_shards"),
        sum(when(col("t_shard") === col("e_shard"), 1L).otherwise(0L))
          .cast("bigint").as("aligned"),
        max(abs(col("t_shard") - col("e_shard"))).cast("bigint").as("max_drift"))
      .withColumn("aligned_bp", expr("(aligned * 10000) div n_pairs").cast("bigint"))
      .orderBy(col("source"))
  }

  val e27Sql: String =
    s"""WITH p AS (
       |  SELECT d.source, d.doc_id,
       |    CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS tb,
       |    CAST(len(e.embedding) * 4 AS BIGINT) AS eb
       |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
       |c AS (
       |  SELECT source, doc_id, tb, eb,
       |    sum(tb) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - tb AS t_start,
       |    sum(eb) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - eb AS e_start
       |  FROM p),
       |b AS (
       |  SELECT source,
       |    (sum(tb) + ${ShardBytes - 1}) // $ShardBytes AS n_shards,
       |    (sum(eb) + (sum(tb) + ${ShardBytes - 1}) // $ShardBytes - 1)
       |      // ((sum(tb) + ${ShardBytes - 1}) // $ShardBytes) AS e_budget
       |  FROM p GROUP BY 1)
       |SELECT c.source, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(max(b.n_shards) AS BIGINT) AS n_shards,
       |  CAST(sum(CASE WHEN c.t_start // $ShardBytes = c.e_start // b.e_budget
       |    THEN 1 ELSE 0 END) AS BIGINT) AS aligned,
       |  CAST(max(abs(c.t_start // $ShardBytes - c.e_start // b.e_budget)) AS BIGINT) AS max_drift,
       |  CAST(sum(CASE WHEN c.t_start // $ShardBytes = c.e_start // b.e_budget
       |    THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS aligned_bp
       |FROM c JOIN b USING (source)
       |GROUP BY c.source ORDER BY c.source""".stripMargin

  /** e28: loader READAHEAD profile — how sequential each worker's
    * shard walk actually is. e12 assigns rank r the positions ≡ r mod
    * W of the epoch's shuffled shard order; a transition in that walk
    * is FREE (readahead/open-handle reuse) only when the next shard is
    * the same source's next ordinal, and every other transition is a
    * seek. Per (epoch, worker): shards, longest sequential run, and
    * the sequential-transition share (bp) — the number that says
    * whether shuffling at shard grain destroyed IO locality (it
    * should, nearly: a high seq share means the shuffle is too weak
    * for sampling purposes — this audit reads BOTH ways). Exact
    * integers; islands via the position − cumulative-seq key.
    *
    * Shape: e12's manifest-grain assignment frame (shared derivation —
    * the audit provably reads the placement rule it audits), one
    * lag+cumsum window per (epoch, worker), two reduces. */
  def e28ReadaheadRuns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("epoch"), col("worker"))
      .orderBy(col("shuffle_key"), col("source"), col("shard_idx"))
    val runs = e12AssignmentFrame(spark, dir)
      .withColumn("pos", row_number().over(w))
      .withColumn("seq",
        coalesce((col("source") === lag(col("source"), 1).over(w) &&
          col("shard_idx") === lag(col("shard_idx"), 1).over(w) + 1)
          .cast("long"), lit(0L)))
      .withColumn("island", col("pos") -
        sum(col("seq")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("epoch"), col("worker"), col("island"))
      .agg(count(lit(1)).as("run_len"))
    runs.groupBy(col("epoch"), col("worker"))
      .agg(sum(col("run_len")).as("n_shards"),
        count(lit(1)).as("n_islands"),
        max(col("run_len")).as("longest_run"))
      .select(col("epoch").cast("bigint").as("epoch"),
        col("worker").cast("bigint").as("worker"),
        col("n_shards").cast("bigint").as("n_shards"),
        col("longest_run").cast("bigint").as("longest_run"),
        when(col("n_shards") > 1,
          expr("((n_shards - n_islands) * 10000) div (n_shards - 1)"))
          .otherwise(lit(0L)).cast("bigint").as("seq_bp"))
      .orderBy(col("epoch"), col("worker"))
  }

  val e28Sql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       |  FROM documents GROUP BY 1),
       |shards AS (
       |  SELECT source, total_bytes,
       |    unnest(range(0, (total_bytes + ${ShardBytes - 1}) // $ShardBytes)) AS shard_idx
       |  FROM s),
       |e AS (
       |  SELECT source, shard_idx, unnest(range(0, $Epochs)) AS epoch FROM shards),
       |k AS (
       |  SELECT epoch, source, shard_idx,
       |    md5(source || ':' || shard_idx || ':' || epoch) AS shuffle_key FROM e),
       |pos AS (
       |  SELECT epoch, source, shard_idx, shuffle_key,
       |    (row_number() OVER (PARTITION BY epoch
       |      ORDER BY shuffle_key, source, shard_idx) - 1) % $LoaderWorkers AS worker
       |  FROM k),
       |wk AS (
       |  SELECT epoch, worker, source, shard_idx,
       |    row_number() OVER (PARTITION BY epoch, worker
       |      ORDER BY shuffle_key, source, shard_idx) AS p,
       |    CASE WHEN source = lag(source) OVER (PARTITION BY epoch, worker
       |        ORDER BY shuffle_key, source, shard_idx)
       |      AND shard_idx = lag(shard_idx) OVER (PARTITION BY epoch, worker
       |        ORDER BY shuffle_key, source, shard_idx) + 1
       |      THEN 1 ELSE 0 END AS seq
       |  FROM pos),
       |isl AS (
       |  SELECT epoch, worker,
       |    p - sum(seq) OVER (PARTITION BY epoch, worker ORDER BY p
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM wk),
       |runs AS (
       |  SELECT epoch, worker, island, count(*) AS run_len
       |  FROM isl GROUP BY 1, 2, 3),
       |agg AS (
       |  SELECT epoch, worker, sum(run_len) AS n_shards,
       |    count(*) AS n_islands, max(run_len) AS longest_run
       |  FROM runs GROUP BY 1, 2)
       |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(worker AS BIGINT) AS worker,
       |  CAST(n_shards AS BIGINT) AS n_shards,
       |  CAST(longest_run AS BIGINT) AS longest_run,
       |  CAST(CASE WHEN n_shards > 1
       |    THEN ((n_shards - n_islands) * 10000) // (n_shards - 1)
       |    ELSE 0 END AS BIGINT) AS seq_bp
       |FROM agg ORDER BY epoch, worker""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e28_readahead_runs" -> (e28ReadaheadRuns _),
    "e27_pair_locality" -> (e27PairLocality _),
    "e26_byte_budget" -> (e26ByteBudget _),
    "e25_resume_plan" -> (e25ResumePlan _),
    "e24_epoch_stability" -> (e24EpochStability _),
    "e23_read_coalesce" -> (e23ReadCoalesce _),
    "e22_schedule_mixing" -> (e22ScheduleMixing _),
    "e21_rendezvous_placement" -> (e21RendezvousPlacement _),
    "e20_shard_integrity" ->
      ((s: SparkSession, d: String) => graft.sources.TarShardSink.e20ShardIntegrity(s, d)),
    "e19_tar_index" ->
      ((s: SparkSession, d: String) => graft.sources.TarShardSink.e19TarIndex(s, d)),
    "e18_written_shards" ->
      ((s: SparkSession, d: String) => graft.sources.TarShardSink.e18WrittenShards(s, d)),
    "e17_tar_layout" -> (e17TarLayout _),
    "e16_shard_sync_plan" -> (e16ShardSyncPlan _),
    "e15_frame_sample_plan" -> (e15FrameSamplePlan _),
    "e14_resolution_ladder" -> (e14ResolutionLadder _),
    "e13_shard_checksum" -> (e13ShardChecksum _),
    "e12_loader_assignment" -> (e12LoaderAssignment _),
    "e11_pair_manifest" -> (e11PairManifest _),
    "e10_shard_repack" -> (e10ShardRepack _),
    "e9_modality_mix" -> (e9ModalityMix _),
    "e8_aspect_buckets" -> (e8AspectBuckets _),
    "e7_epoch_schedule" -> (e7EpochSchedule _),
    "e6_blob_dedup" -> (e6BlobDedup _),
    "e1_multimodal_meta" -> (e1MultimodalMeta _),
    "e2_blob_shard" -> (e2BlobShard _),
    "e3_shard_stats" -> (e3ShardStats _),
    "e4_format_profile" -> (e4FormatProfile _),
    "e5_interleave_pack" -> (e5InterleavePack _))

  val oracles: Map[String, String] = Map(
    "e28_readahead_runs" -> e28Sql,
    "e27_pair_locality" -> e27Sql,
    "e26_byte_budget" -> e26Sql,
    "e25_resume_plan" -> e25Sql,
    "e24_epoch_stability" -> e24Sql,
    "e23_read_coalesce" -> e23Sql,
    "e22_schedule_mixing" -> e22Sql,
    "e21_rendezvous_placement" -> e21Sql,
    "e20_shard_integrity" -> graft.sources.TarShardSink.e20Sql,
    "e19_tar_index" -> graft.sources.TarShardSink.e19Sql,
    "e18_written_shards" -> graft.sources.TarShardSink.e18Sql,
    "e17_tar_layout" -> e17Sql,
    "e16_shard_sync_plan" -> e16Sql,
    "e15_frame_sample_plan" -> e15Sql,
    "e14_resolution_ladder" -> e14Sql,
    "e13_shard_checksum" -> e13Sql,
    "e12_loader_assignment" -> e12Sql,
    "e11_pair_manifest" -> e11Sql,
    "e10_shard_repack" -> e10Sql,
    "e9_modality_mix" -> e9Sql,
    "e8_aspect_buckets" -> e8Sql,
    "e7_epoch_schedule" -> e7Sql,
    "e6_blob_dedup" -> e6Sql,
    "e1_multimodal_meta" -> e1Sql,
    "e2_blob_shard" -> e2Sql,
    "e3_shard_stats" -> e3Sql,
    "e4_format_profile" -> e4Sql,
    "e5_interleave_pack" -> e5Sql)
}
