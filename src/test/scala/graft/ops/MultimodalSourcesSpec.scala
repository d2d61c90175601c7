package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class MultimodalSourcesSpec extends SparkSpec {
  import spark.implicits._

  // test-side twin of Sampling.hashU24 + the alignment op's feature
  // hashing: bucket = h % dims (0-based here, 1-based in the op), sign
  // from the hash's next bit
  private def hashU24(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(3).map(b => f"$b%02x").mkString, 16)
  }
  private def hashedTextVec(text: String, dims: Int): Array[Long] = {
    val v = new Array[Long](dims)
    text.trim.split(" ", -1).foreach { tok =>
      val h = hashU24(tok)
      v((h % dims).toInt) += (if ((h / dims) % 2 == 0) 1L else -1L)
    }
    v
  }

  test("alignmentScores: self-aligned text scores ~1, negated ~-1, unpaired absent") {
    val dims = 16
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "sphinx of black quartz judge my vow")
    val docs = (texts :+ (9L -> "unpaired document with no embedding row"))
      .toDF("doc_id", "text")
    // embeddings = the doc's OWN hashed text vector (doc 2 negated): the
    // exact cosine must land at ±1 up to trunc-9 quantization
    val embs = texts.map { case (id, tx) =>
      val sign = if (id == 2L) -1f else 1f
      (id, hashedTextVec(tx, dims).map(x => sign * x.toFloat))
    }.toDF("vec_id", "embedding")
    val out = Multimodal
      .alignmentScores(docs, embs, "doc_id", "text", "vec_id", "embedding", dims)
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"unexpected ledger keys: ${out.keySet}")
    // trunc-9 dot over exact norms can land an ulp past ±1 — bound both sides
    assert(out(1L) > 1.0 - 1e-6 && out(1L) < 1.0 + 1e-9)
    assert(out(3L) > 1.0 - 1e-6 && out(3L) < 1.0 + 1e-9)
    assert(out(2L) < -1.0 + 1e-6 && out(2L) > -1.0 - 1e-9)
  }

  test("alignmentScores: zero text vector (cancelling signs) yields NULL, not 0") {
    val dims = 16
    // find two tokens hashing to the SAME bucket with OPPOSITE signs so
    // the hashed vector cancels to exactly zero
    val toks = (0 until 4096).map(i => s"tok$i")
    val byBucket = toks.groupBy(t => (hashU24(t) % dims).toInt)
    val pair = byBucket.values.flatMap { ts =>
      val (pos, neg) = ts.partition(t => (hashU24(t) / dims) % 2 == 0)
      if (pos.nonEmpty && neg.nonEmpty) Some((pos.head, neg.head)) else None
    }.head
    val docs = Seq((1L, s"${pair._1} ${pair._2}")).toDF("doc_id", "text")
    val embs = Seq((1L, Array.fill(dims)(1.0f))).toDF("vec_id", "embedding")
    val rows = Multimodal
      .alignmentScores(docs, embs, "doc_id", "text", "vec_id", "embedding", dims)
      .collect()
    assert(rows.length == 1 && rows(0).isNullAt(1),
      "zero-norm text vector must score NULL (fail-closed), not a number")
  }

  test("multimodal: payload attach + partition-local decode + frame sampling") {
    val df = Seq((1L, "abcdefgh"), (2L, "zzzz")).toDF("id", "raw")
    val withPayload = Multimodal.attachPayload(df, "raw")
    val meta = withPayload.select("media_meta.n_bytes").as[Long].collect().sorted.toSeq
    assert(meta == Seq(4L, 8L))

    val feats = Multimodal.decodeFeatures(withPayload, "id")
    val f = feats.orderBy("id").select("features").as[Seq[Double]].collect()
    assert(f.forall(_.size == Multimodal.FeatureDim))
    assert(f.forall(v => math.abs(v.sum - 1.0) < 1e-12)) // L1-normalized
    // deterministic: same bytes → same features
    val again = Multimodal.decodeFeatures(withPayload, "id")
      .orderBy("id").select("features").as[Seq[Double]].collect()
    assert(f.toSeq == again.toSeq)

    val frames = Multimodal.sampleFrames(withPayload, "id", 3)
    val byId = frames.groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(byId == Map(1L -> 3L, 2L -> 2L)) // ceil(8/3)=3, ceil(4/3)=2
    val firstFrame = frames.filter(col("id") === 1 && col("frame_idx") === 0)
      .select(col("frame_bytes").cast("string")).as[String].head()
    assert(firstFrame == "abc")
  }

  test("decodeBmp24: hand-written 2x2 24-bit BMP decodes to known pixels") {
    // genuine external fixture, written byte-by-byte (NOT via bmp24Bytes,
    // so a writer/parser co-bug can't self-validate): 2×2, 24 bpp,
    // bottom-up, stride 8 (= 2·3 rounded to 4). Display pixels top-down:
    // (1,2,3)(4,5,6) / (7,8,9)(10,11,12) — stored bottom row first.
    val bmp: Array[Byte] = (Seq(
      0x42, 0x4D, // "BM"
      70, 0, 0, 0, // file size 54 + 2*8
      0, 0, 0, 0, // reserved
      54, 0, 0, 0, // pixel offset
      40, 0, 0, 0, // info header size
      2, 0, 0, 0, // width 2
      2, 0, 0, 0, // height 2 (positive → bottom-up)
      1, 0, // planes
      24, 0, // bpp
      0, 0, 0, 0, // compression BI_RGB
      16, 0, 0, 0, // image size 2 rows × stride 8
      0x13, 0x0B, 0, 0, 0x13, 0x0B, 0, 0, // 2835 ppm x/y
      0, 0, 0, 0, 0, 0, 0, 0, // palette counts
      7, 8, 9, 10, 11, 12, 0, 0, // stored row 0 = display BOTTOM row + stride pad
      1, 2, 3, 4, 5, 6, 0, 0 // stored row 1 = display TOP row + stride pad
    ).map(_.toByte)).toArray
    val decoded = Multimodal.decodeBmp24(bmp)
    assert(decoded.map(_.toSeq) == Some(Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
    // the kernel takes the BMP branch: 12 channel bytes, all < 16 → bin 0
    val feats = Multimodal.decodeKernel(bmp)
    assert(feats(0) == 1.0 && feats.sum == 1.0)
    // non-BMP payloads miss the branch: same bytes minus the magic
    val broken = bmp.clone(); broken(0) = 'X'.toByte
    assert(Multimodal.decodeBmp24(broken).isEmpty)
  }

  test("bmp24Bytes roundtrips through decodeBmp24 incl. tail zero-padding") {
    // one exact row (48 channel bytes at the canonical width 16)
    val full = (0 until 48).map(_.toByte).toArray
    assert(Multimodal.decodeBmp24(Multimodal.bmp24Bytes(full)).map(_.toSeq)
      == Some(full.toSeq))
    // 50 bytes → 2 rows, 46 tail zeros appended by the encoder
    val ragged = (1 to 50).map(_.toByte).toArray
    val dec = Multimodal.decodeBmp24(Multimodal.bmp24Bytes(ragged)).get
    assert(dec.length == 96)
    assert(dec.take(50).toSeq == ragged.toSeq && dec.drop(50).forall(_ == 0))
    // empty input still yields one all-zero row (height ≥ 1)
    val empty = Multimodal.decodeBmp24(Multimodal.bmp24Bytes(Array.emptyByteArray)).get
    assert(empty.length == 48 && empty.forall(_ == 0))
  }

  test("WAV PCM-16 roundtrip; kernel dispatches BMP/WAV/opaque correctly") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 4096)
    val wav = Multimodal.wavPcm16Bytes(samples)
    assert(Multimodal.decodeWavPcm16(wav).map(_.toSeq) == Some(samples.toSeq))
    // amplitude bins: (s + 32768) >> 12 → 8, 8, 7, 15, 0, 9
    val f = Multimodal.decodeKernel(wav)
    assert(f(8) == 2.0 / 6.0 && f(7) == 1.0 / 6.0 && f(15) == 1.0 / 6.0 &&
      f(0) == 1.0 / 6.0 && f(9) == 1.0 / 6.0)
    // opaque payload falls back to the raw byte-intensity histogram
    val opaque = "hello".getBytes("UTF-8") // all bytes in 0x60-0x6f → bin 6
    assert(Multimodal.decodeKernel(opaque).toSeq ==
      (0 until 16).map(i => if (i == 6) 1.0 else 0.0))
    // truncated RIFF junk must not crash the kernel, just fall back
    val junk = "RIFFxxxxWAVE".getBytes("UTF-8")
    assert(Multimodal.decodeKernel(junk).sum > 0.999)
  }

  test("crafted oversized headers fall back instead of throwing (Int-wrap hazards)") {
    // BMP whose width 0x2AAAAAAB makes w*3 wrap negative in Int arithmetic:
    // must decode to None / fall back, never NegativeArraySizeException
    val hostile = Multimodal.bmp24Bytes(Array[Byte](1, 2, 3))
    val bb = java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x2AAAAAAB) // width ≈ 2^31/3 + 1
    assert(Multimodal.decodeBmp24(hostile).isEmpty)
    assert(Multimodal.decodeKernel(hostile).sum > 0.999)
    // negative-height Int.MinValue: math.abs is still negative — reject
    val minH = Multimodal.bmp24Bytes(Array[Byte](1, 2, 3))
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assert(Multimodal.decodeBmp24(minH).isEmpty)
    // WAV chunk whose size near 2^31 wraps pos+8+sz negative past the old
    // bounds check: must return None, never an out-of-bounds read
    val wav = Multimodal.wavPcm16Bytes(Array[Short](1, 2, 3))
    java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 4) // "data" chunk size
    assert(Multimodal.decodeWavPcm16(wav).isEmpty)
    assert(Multimodal.decodeKernel(wav).sum > 0.999)
  }

  test("encodeBmpPayload → decodeFeatures: end-to-end over a DataFrame") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("id", "raw")
    val enc = Multimodal.encodeBmpPayload(df, "id", "raw")
    // payloads are real BMPs
    val payloads = enc.orderBy("id").select("payload").as[Array[Byte]].collect()
    assert(payloads.forall(p => p(0) == 'B'.toByte && p(1) == 'M'.toByte))
    val feats = Multimodal.decodeFeatures(enc, "id")
      .orderBy("id").select("features").as[Seq[Double]].collect()
    // doc 1: 'a','b','c' (bin 6) + 45 zero-pad (bin 0) over 48 channels
    assert(feats(0)(6) == 3.0 / 48.0 && feats(0)(0) == 45.0 / 48.0)
    // doc 2: empty text → one all-zero row
    assert(feats(1)(0) == 1.0 && feats(1).sum == 1.0)
  }

  test("resizeFeatures chains 16→8→4 and means adjacent blocks") {
    val feats = (0 until 16).map(_.toDouble) // 0..15
    val df = Seq((1L, feats)).toDF("id", "features")
    val once = Multimodal.resizeFeatures(df, "features", 16, 2, "p8")
    val twice = Multimodal.resizeFeatures(once, "p8", 8, 2, "p4")
    val (p8, p4) = twice.select("p8", "p4").as[(Seq[Double], Seq[Double])].head()
    assert(p8 == Seq(0.5, 2.5, 4.5, 6.5, 8.5, 10.5, 12.5, 14.5))
    assert(p4 == Seq(1.5, 5.5, 9.5, 13.5))
  }

  test("Profiling.profile: one row per column; distinct excludes NULL") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "v")
    val out = Profiling.profile(df, Seq("k", "v"))
      .orderBy("column")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("k", 4L, 1L, 2L), ("v", 4L, 1L, 2L)))
  }

  test("Profiling.profile(approx = true): same shape, HLL distincts, no Expand") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "v")
    val approx = Profiling.profile(df, Seq("k", "v"), approx = true)
    // HLL++ at default rsd is exact on tiny cardinalities, so values match
    val out = approx.orderBy("column").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("k", 4L, 1L, 2L), ("v", 4L, 1L, 2L)))
    // the scale rationale: the approx plan must not contain the exact
    // path's Expand row-replication
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile still plans an Expand:\n$plan")
  }

  test("Profiling.partitionSizes: one row per partition, counts sum to the total") {
    val df = spark.range(100).repartition(8)
    val out = Profiling.partitionSizes(df.toDF())
      .as[(Int, Long)].collect().toSeq
    assert(out.length <= 8 && out.map(_._2).sum == 100L)
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("bucketed tables equi-join on the bucket key with NO shuffle exchange") {
    val dir = Files.createTempDirectory("graft_bucket").toString
    val a = spark.range(1000).select(col("id"), (col("id") % 7).as("va"))
    val b = spark.range(1000).select(col("id"), (col("id") * 2).as("vb"))
    Sources.writeBucketed(a, "bkt_a", s"$dir/a", "id", 4, sortCols = Seq("id"))
    Sources.writeBucketed(b, "bkt_b", s"$dir/b", "id", 4, sortCols = Seq("id"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("gapSessions: strict-gap boundary, 0-based ids, leading row opens session 0") {
    val rows = Seq(
      ("u1", 0L), ("u1", 1000L), // gap == gapUs: SAME session (strict >)
      ("u1", 2001L), // gap 1001 > 1000: new session
      ("u2", 50L)
    ).toDF("user", "ts")
    val out = Segments.gapSessions(rows, Seq("user"), "ts", 1000L)
      .select("user", "ts", "session_idx").as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("u1", 0L, 0L), ("u1", 1000L, 0L), ("u1", 2001L, 1L), ("u2", 50L, 0L)))
  }

  test("S1/S4: headerless CSV roundtrip with positional schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val schema = StructType(Seq(
      StructField("key", StringType),
      StructField("start", DoubleType),
      StructField("end", DoubleType),
      StructField("action", StringType)))
    val df = Seq(("s01t01.la", 0.0, 3.4, "la-lift")).toDF("key", "start", "end", "action")
    Sources.writeCsvHeaderless(df, s"$dir/out")
    val back = Sources.csvHeaderless(spark, schema, s"$dir/out")
    assert(back.as[(String, Double, Double, String)].collect().toSeq ==
      Seq(("s01t01.la", 0.0, 3.4, "la-lift")))
  }

  test("JSONL roundtrip with explicit schema; malformed lines stay PERMISSIVE") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = Seq((1L, "the quick fox"), (2L, "lazy dog")).toDF("doc_id", "text")
    Sources.writeJsonl(df, s"$dir/out")
    // Spark disallows queries touching ONLY the corrupt column on raw
    // files — cache first (the documented pattern)
    val back = Sources.jsonl(spark, schema, s"$dir/out").cache()
    assert(back.orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect().toSeq ==
      Seq((1L, "the quick fox"), (2L, "lazy dog")))
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
    back.unpersist()
    // a corrupt shard line is QUARANTINED into _corrupt_record (carrying the
    // raw line), distinguishable from a legitimate record with null fields
    val corruptDir = Files.createTempDirectory("graft_jsonl2").toString
    Files.write(java.nio.file.Paths.get(s"$corruptDir/shard.jsonl"),
      "{\"doc_id\": 3, \"text\": \"ok\"}\nnot json at all\n{\"doc_id\": null, \"text\": null}\n".getBytes("UTF-8"))
    val mixed = Sources.jsonl(spark, schema, corruptDir).cache()
    assert(mixed.count() == 3)
    assert(mixed.filter(col("doc_id") === 3L).count() == 1)
    val corrupt = mixed.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().toSeq
    assert(corrupt == Seq("not json at all"))
    // the all-null-but-valid record is NOT flagged corrupt
    assert(mixed.filter(col("_corrupt_record").isNull && col("doc_id").isNull).count() == 1)
    mixed.unpersist()
  }

  test("ORC roundtrip with explicit schema; predicate pushes to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = Seq((1L, "the quick fox"), (2L, "lazy dog"), (3L, "third doc")).toDF("doc_id", "text")
    Sources.writeOrc(df, s"$dir/out")
    val back = Sources.orc(spark, schema, s"$dir/out")
    assert(back.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "the quick fox"), (2L, "lazy dog"), (3L, "third doc")))
    // the filter must reach the ORC scan (stripe-statistics pruning at scale)
    val plan = back.filter(col("doc_id") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
  }

  test("S3: filename-derived key columns via regex") {
    val dir = Files.createTempDirectory("graft_files").toString
    Seq((0.0, 1.0)).toDF("ts", "v").coalesce(1).write
      .option("header", "true").csv(s"$dir/s01t02")
    val schema = StructType(Seq(StructField("ts", DoubleType), StructField("v", DoubleType)))
    val df = spark.read.schema(schema).option("header", "true").csv(s"$dir/s01t02/*.csv")
    val keyed = Sources.withFilenameKeys(df, "^(part-\\d+)", Seq("part" -> 1))
    assert(keyed.select("part").as[String].head().startsWith("part-"))
    // the reference pattern: subject/trial from a sNNtNN-style name
    val df2 = Seq(("s04t07", 1.0)).toDF("fn", "v")
      .withColumn("subject", substring(col("fn"), 1, 3))
      .withColumn("trial", substring(col("fn"), 4, 3))
    assert(df2.select("subject", "trial").as[(String, String)].head() == (("s04", "t07")))
  }
}
