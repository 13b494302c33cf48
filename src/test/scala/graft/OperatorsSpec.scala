package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.{AsOfJoin, Multimodal}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Vectors.cosine computes in double precision with null-safe zero norms") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))
    ).toDF("a", "b")
    val out = df.select(Vectors.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect()
    assert(math.abs(out(0).get - 1.0) < 1e-12)
    assert(math.abs(out(1).get) < 1e-12)
    assert(out(2).isEmpty)
  }

  test("as-of join picks the greatest right value <= left dim, per key") {
    val left = Seq((1L, 10.0, "e1"), (1L, 4.0, "e2"), (2L, 100.0, "e3"), (3L, 5.0, "e4"))
      .toDF("k", "dim", "name")
    val right = Seq((1L, 3.0), (1L, 7.0), (1L, 11.0), (2L, 50.0))
      .toDF("rk", "price")
    val out = AsOfJoin.asOf(left, right, "k", "dim", "rk", "price", "price")
      .select("name", "price").as[(String, Option[Double])].collect().toMap
    assert(out("e1").contains(7.0))  // 7 <= 10 < 11
    assert(out("e2").contains(3.0))  // 3 <= 4 < 7
    assert(out("e3").contains(50.0))
    assert(out("e4").isEmpty)        // key 3 has no right rows
  }

  test("as-of join matches a right row at exactly the left dim (<=, not <)") {
    val left = Seq((1L, 7.0, "e")).toDF("k", "dim", "name")
    val right = Seq((1L, 7.0)).toDF("rk", "price")
    val out = AsOfJoin.asOf(left, right, "k", "dim", "rk", "price", "price")
      .select("price").as[Option[Double]].collect()
    assert(out(0).contains(7.0))
  }

  test("multimodal feature extraction: byte histogram is deterministic and normalized") {
    val media = Multimodal.withMediaColumns(
      Seq((0L, "aaaa"), (1L, "")).toDF("doc_id", "text"))
    val feats = Multimodal.extractFeatures(Multimodal.asMediaDataset(media))
      .collect().sortBy(_.doc_id)
    assert(feats(0).byte_len == 4)
    // 'a' = 0x61 → bin 6 gets everything
    assert(math.abs(feats(0).features(6) - 1.0f) < 1e-6)
    assert(math.abs(feats(0).features.sum - 1.0f) < 1e-6f)
    assert(feats(1).byte_len == 0)
  }

  test("bucketed range join equals the naive BETWEEN join across bucket edges") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 5L), (2L, 100L), (3L, 101L), (4L, 250L), (5L, 99L))
      .toDF("pid", "ts")
    // intervals crossing bucket boundaries, nested, and empty
    val ivs = Seq((10L, 0L, 100L), (11L, 90L, 260L), (12L, 240L, 241L), (13L, 500L, 600L))
      .toDF("iv", "s", "e")
    val bucketed = RangeJoin.pointInInterval(points, "ts", ivs, "s", "e", bucketWidth = 64L)
      .select("pid", "iv").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iv").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed == Set((1L, 10L), (5L, 10L), (5L, 11L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("TopKSumAgg equals the window-based top-k sum, including tie groups") {
    import org.apache.spark.sql.expressions.Window
    val d = Seq((1, 5.0), (1, 5.0), (1, 3.0), (1, 1.0), (2, 2.0), (3, 9.0), (3, 7.0), (3, 7.0))
      .toDF("g", "v")
    val topk = udaf(new graft.functions.TopKSumAgg(2))
    val agg = d.groupBy("g").agg(topk(col("v")).as("s"))
      .as[(Int, Double)].collect().toMap
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val win = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy("g").agg(sum("v").as("s"))
      .as[(Int, Double)].collect().toMap
    assert(agg == win)
    assert(agg(1) == 10.0 && agg(2) == 2.0 && agg(3) == 16.0)
  }

  test("TopKDocsAgg matches the window top-k per group and is split-agnostic") {
    // the low-cardinality-group top-k (per-domain caps): partial buffers
    // merge in arbitrary order at scale, so the kept set and its final
    // ordering must be independent of how the input was split
    val agg = new graft.functions.TopKDocsAgg(3)
    val rows = Seq((50L, 7L), (50L, 3L), (50L, 9L), (10L, 1L), (99L, 2L), (50L, 1L), (10L, 2L))
    val expected = Seq((99L, 2L), (50L, 1L), (50L, 3L)) // score DESC, id ASC
    assert(agg.finish(rows.foldLeft(agg.zero)(agg.reduce)) == expected)
    // every 2-way split merges to the same answer
    (0 to rows.size).foreach { cut =>
      val (a, b) = rows.splitAt(cut)
      val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m) == expected, s"split at $cut")
    }
    // end-to-end through groupByKey: equals the window plan
    val d = Seq(("a", 5L, 2L), ("a", 5L, 1L), ("a", 3L, 9L), ("a", 7L, 4L), ("b", 1L, 1L))
      .toDF("g", "score", "id").as[(String, Long, Long)]
    val typed = d.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new graft.functions.TopKDocsAgg(2).toColumn.name("top"))
      .collect().toMap
    assert(typed("a") == Seq((7L, 4L), (5L, 1L)) && typed("b") == Seq((1L, 1L)))
  }

  test("chunking emits overlapping windows with a trailing partial chunk") {
    import graft.operators.TextAnalysis
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(d, chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // stride 3: starts 0,3,6,9 over 10 tokens; empty doc -> no chunks
    assert(out.toSeq == Seq(
      (1L, 0L, "w1 w2 w3 w4", 4L),
      (1L, 1L, "w4 w5 w6 w7", 4L),
      (1L, 2L, "w7 w8 w9 w10", 4L),
      (1L, 3L, "w10", 1L)))
  }

  test("PII redaction replaces emails and long digit runs, counting both") {
    import graft.operators.TextAnalysis
    val d = Seq((1L, "mail bob.smith+x@corp.example.org id 12345678 pin 123 done"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d).collect()(0)
    assert(r.getAs[Long]("email_cnt") == 1L)
    assert(r.getAs[Long]("number_cnt") == 1L)
    assert(r.getAs[String]("redacted") == "mail <EMAIL> id <NUM> pin 123 done")
  }

  test("PII audit counts equal the placeholders actually emitted") {
    import graft.operators.TextAnalysis
    // the digits live inside the email: the email pass consumes them, so
    // number_cnt must be 0 — no phantom <NUM> in the audit trail
    val d = Seq((1L, "contact user12345678@x.com today")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d).collect()(0)
    assert(r.getAs[Long]("email_cnt") == 1L)
    assert(r.getAs[Long]("number_cnt") == 0L)
    assert(r.getAs[String]("redacted") == "contact <EMAIL> today")
  }

  test("feature extraction accepts a custom extractor (the model plug point)") {
    import graft.operators.Multimodal
    object LenAndFirst extends Multimodal.FeatureExtractor {
      def extract(media: Array[Byte]): Array[Float] =
        Array(media.length.toFloat, if (media.isEmpty) 0f else media(0).toFloat)
    }
    val media = Multimodal.withMediaColumns(Seq((1L, "abc")).toDF("doc_id", "text"))
    val out = Multimodal.extractFeatures(Multimodal.asMediaDataset(media), LenAndFirst)
      .collect()(0)
    assert(out.features.toSeq == Seq(3f, 'a'.toFloat))
    assert(out.bins.isEmpty) // custom extractor provides no integer evidence
  }

  test("frame plan samples at fps up to the cap and skips zero-length media") {
    import graft.operators.Multimodal
    // doc 3: 120 ms -> 0 frames; doc 5: 5000 ms -> 5 frames; doc 7: forever -> capped
    val media = Seq((3L, 120L), (5L, 5000L), (7L, 3600000L))
      .toDF("doc_id", "d")
      .select(col("doc_id"), struct(lit("video/mp4").as("mime"), lit(0).as("width"),
        lit(0).as("height"), col("d").as("durationMs")).as("meta"))
    val out = Multimodal.framePlan(media, fps = 1, maxFrames = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!out.exists(_._1 == 3L))
    assert(out.count(_._1 == 5L) == 5)
    assert(out.count(_._1 == 7L) == 32)
    assert(out.filter(_._1 == 5L).map(_._3).sorted.toSeq == Seq(0L, 1000L, 2000L, 3000L, 4000L))
  }

  test("hyperplane signatures are deterministic across invocations") {
    val df = Seq((1L, Array.tabulate(8)(i => i.toFloat))).toDF("vec_id", "embedding")
    val s1 = df.select(Vectors.hyperplaneSignature(col("embedding"), 8, 16).as("s"))
      .as[Long].collect()(0)
    val s2 = df.select(Vectors.hyperplaneSignature(col("embedding"), 8, 16).as("s"))
      .as[Long].collect()(0)
    assert(s1 == s2)
  }

  test("jaccard_x1000 equals the intersect/union composition (incl. empties and dups)") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),   // 2/4 -> 500
      (Seq(1L, 1L, 2L), Seq(2L, 2L)),       // dup elements: {1,2} vs {2} -> 1/2
      (Seq.empty[Long], Seq(1L)),           // 0/1 -> 0
      (Seq.empty[Long], Seq.empty[Long]),   // both empty -> 0
      (Seq(5L, 6L), Seq(5L, 6L))            // equal -> 1000
    ).toDF("a", "b")
    val out = df.select(
      call_function("jaccard_x1000", col("a"), col("b")).as("fused"),
      // try_divide: ANSI mode traps the both-empty 0/0 in the composition
      floor(try_divide(size(array_intersect(col("a"), col("b"))).cast("long") * 1000L,
        size(array_union(col("a"), col("b"))))).cast("long").as("composed")).collect()
    out.foreach { r =>
      val composed = if (r.isNullAt(1)) 0L else r.getLong(1) // 0/0 division is null
      assert(r.getLong(0) == composed || (r.getLong(0) == 0L && r.isNullAt(1)))
    }
    assert(out.map(_.getLong(0)).toSeq == Seq(500L, 500L, 0L, 0L, 1000L))
  }

  test("as-of directions: backward takes <=, forward >=, nearest the closer with back-ties") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, "u", 10.0), (2L, "u", 24.0), (3L, "u", 3.0)).toDF("id", "k", "dim")
    val right = Seq(("u", 5.0), ("u", 20.0), ("u", 40.0)).toDF("k", "rdim")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                String, String, String, String, String) => org.apache.spark.sql.DataFrame) =
      f(left, right, "k", "dim", "k", "rdim", "rdim")
        .select("id", "rdim").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val back = run(AsOfJoin.asOf)
    assert(back == Map(1L -> Some(5.0), 2L -> Some(20.0), 3L -> None))
    val fwd = run(AsOfJoin.asOfForward)
    assert(fwd == Map(1L -> Some(20.0), 2L -> Some(40.0), 3L -> Some(5.0)))
    val near = run(AsOfJoin.asOfNearest)
    // id=1: |10-5|=5 vs |10-20|=10 -> 5; id=2: |24-20|=4 vs |24-40|=16 -> 20
    assert(near == Map(1L -> Some(5.0), 2L -> Some(20.0), 3L -> Some(5.0)))
  }

  test("as-of nearest keeps left rows with NULL columns and duplicate left rows") {
    import graft.operators.AsOfJoin
    // one row with a null payload-bearing column, plus an exact duplicate
    // pair — a rejoin on the left columns would drop the former and
    // cross-multiply the latter
    val left = Seq(
      (1L, "u", 10.0, Option("a")),
      (2L, "u", 24.0, None),
      (3L, "u", 3.0, Option("c")),
      (3L, "u", 3.0, Option("c"))
    ).toDF("id", "k", "dim", "tag")
    val right = Seq(("u", 5.0), ("u", 20.0), ("u", 40.0)).toDF("k", "rdim")
    val out = AsOfJoin.asOfNearest(left, right, "k", "dim", "k", "rdim", "rdim")
      .select("id", "rdim").collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.length == 4, s"expected all 4 left rows, got ${out.toSeq}")
    assert(out.toMap == Map(1L -> Some(5.0), 2L -> Some(20.0), 3L -> Some(5.0)))
    assert(out.count(_._1 == 3L) == 2, "duplicate left rows must both survive")
  }

  test("matched dim tracks the row that supplied the payload, skipping null payloads") {
    import graft.operators.AsOfJoin
    // right row at dim 9 has a NULL payload: it must not advance the matched
    // dim, or tolerance would judge freshness against a row that contributed
    // no price (dim 2's price 5.0 is 8 away -> outside tolerance 3)
    val left = Seq((1L, 10.0)).toDF("k", "dim")
    val right = Seq((1L, 2.0, Option(5.0)), (1L, 9.0, Option.empty[Double]))
      .toDF("rk", "rdim", "price")
    val out = AsOfJoin.asOfTolerance(left, right, "k", "dim", "rk", "rdim", "price", 3.0)
      .select("price").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None))
    val loose = AsOfJoin.asOfTolerance(left, right, "k", "dim", "rk", "rdim", "price", 8.0)
      .select("price").as[Option[Double]].collect()
    assert(loose.toSeq == Seq(Some(5.0)))
  }

  test("sketch SQL functions null out arrays containing null elements") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Tuple1(1L)).toDF("x").select(
      array(lit(1L), lit(null).cast("long")).as("bad"),
      array(lit(1L), lit(2L)).as("good"))
    val r = df.select(
      call_function("jaccard_x1000", col("bad"), col("good")).as("j_bad"),
      call_function("jaccard_x1000", col("good"), col("good")).as("j_good"),
      call_function("minhash_sig", col("bad"), lit(4)).as("m_bad"),
      call_function("simhash64", col("bad")).as("s_bad")).collect()(0)
    assert(r.isNullAt(0), "jaccard over a null-element array must be null")
    assert(r.getLong(1) == 1000L)
    assert(r.isNullAt(2), "minhash over a null-element array must be null")
    assert(r.isNullAt(3), "simhash over a null-element array must be null")
  }

  test("dot_i64 computes the integer dot product, nulling mismatch and null elements") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq(Tuple1(1L)).toDF("x").select(
      call_function("dot_i64",
        array(lit(1L), lit(2L), lit(3L)), array(lit(4L), lit(5L), lit(6L))).as("ok"),
      call_function("dot_i64",
        array(lit(1L), lit(2L)), array(lit(4L))).as("mismatch"),
      call_function("dot_i64",
        array(lit(1L), lit(null).cast("long")), array(lit(1L), lit(2L))).as("nullel")
    ).collect()(0)
    assert(r.getLong(0) == 32L)
    assert(r.isNullAt(1), "length mismatch must be null, not a truncated dot")
    assert(r.isNullAt(2), "null element must be null, not garbage")
  }

  test("quantize_meta packs one byte per dim and agrees with quantizeInt8 and dot_u8") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, Array(0f, 1f, 2f, 4f)), (2L, Array(3f, 3f, 3f)))
      .toDF("vec_id", "embedding")
    val rows = df.select(col("vec_id"),
        call_function("quantize_meta", col("embedding")).as("qm"),
        Vectors.quantizeInt8(col("embedding")).as("arr"))
      .select(col("vec_id"), col("qm.code").as("code"), col("qm.mn"), col("qm.scale"),
        col("qm.csum"), col("qm.cdot"), col("arr"),
        call_function("dot_u8", col("qm.code"), col("qm.code")).as("selfdot"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    val code1 = r1.getAs[Array[Byte]]("code").map(b => (b & 0xFF).toLong).toSeq
    assert(code1 == Seq(0L, 63L, 127L, 255L))
    assert(code1 == r1.getSeq[Long](r1.fieldIndex("arr")).toSeq)
    assert(r1.getAs[Double]("mn") == 0.0)
    assert(math.abs(r1.getAs[Double]("scale") - 4.0 / 255.0) < 1e-12)
    assert(r1.getAs[Long]("csum") == 445L)
    assert(r1.getAs[Long]("cdot") == 0L + 63L * 63 + 127L * 127 + 255L * 255)
    assert(r1.getAs[Long]("selfdot") == r1.getAs[Long]("cdot"))
    val r2 = rows(2L)
    assert(r2.getAs[Array[Byte]]("code").forall(_ == 0) &&
      r2.getAs[Double]("scale") == 0.0, "constant vector codes to zeros with scale 0")
  }

  test("shard packing closes a shard once the token budget is reached") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (1L, "s", (1 to 1500).map(_ => "w").mkString(" ")), // cum_before 0    -> shard 0
      (2L, "s", (1 to 1500).map(_ => "w").mkString(" ")), // cum_before 1500 -> shard 0 (straddles)
      (3L, "s", "tiny doc"),                              // cum_before 3000 -> shard 1
      (4L, "t", "other source")                           // own partition   -> shard 0
    ).toDF("doc_id", "source", "text")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = docs
      .select(col("source"), col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
      .withColumn("cum", coalesce(sum("tokens").over(w), lit(0L)))
      .select(col("doc_id"), floor(col("cum") / 2000L).cast("long").as("shard"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("int8 quantization maps min to 0, max to 255, constant vectors to zeros") {
    val df = Seq((1L, Array(0f, 1f, 2f, 4f)), (2L, Array(3f, 3f, 3f)))
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), Vectors.quantizeInt8(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    // (x - 0) * 255 / 4: 0, 63.75->63, 127.5->127, 255
    assert(out(1L) == Seq(0L, 63L, 127L, 255L))
    assert(out(2L) == Seq(0L, 0L, 0L))
  }

  test("hyperplane_sig nulls malformed vectors instead of mis-bucketing them") {
    graft.functions.GraftFunctions.register(spark)
    // wrong dimension (would previously be truncated / zero-padded)
    val short = Seq((1L, Array.tabulate(4)(i => i.toFloat))).toDF("vec_id", "embedding")
      .select(Vectors.hyperplaneSignature(col("embedding"), 8, 16).as("s"))
      .as[Option[Long]].collect()(0)
    assert(short.isEmpty)
    // null element (getFloat on a null slot previously read garbage)
    val withNull = spark.sql(
      "SELECT array(cast(1.0 as float), cast(null as float)) AS embedding")
      .select(Vectors.hyperplaneSignature(col("embedding"), 2, 16).as("s"))
      .as[Option[Long]].collect()(0)
    assert(withNull.isEmpty)
    // well-formed vectors still sign
    val ok = Seq((1L, Array.tabulate(8)(i => i.toFloat))).toDF("vec_id", "embedding")
      .select(Vectors.hyperplaneSignature(col("embedding"), 8, 16).as("s"))
      .as[Option[Long]].collect()(0)
    assert(ok.nonEmpty)
  }

  test("native cosine_sim matches the HOF cosine and is SQL-callable") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(3f, 2f, 1f)),
      (Array(0f, 0f), Array(1f, 1f)),
      (Array(1f, 0f), Array(1f, 0f))
    ).toDF("a", "b")
    val native = df.select(call_function("cosine_sim", col("a"), col("b")).as("c"))
      .as[Option[Double]].collect()
    val hof = df.select(Vectors.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect()
    native.zip(hof).foreach {
      case (Some(n), Some(h)) => assert(math.abs(n - h) < 1e-12)
      case (n, h) => assert(n == h)
    }
    // SQL surface via the registered function
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) c FROM vecs WHERE cosine_sim(a, b) > 0.9")
    assert(viaSql.count() == 1)
  }

  test("native minhash_sig: identical docs share signatures; eval matches codegen math") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, Array(10L, 20L, 30L)),
      (2L, Array(30L, 10L, 20L)), // same set, different order
      (3L, Array(99L))
    ).toDF("id", "hs")
    val sigs = df.select(col("id"), call_function("minhash_sig", col("hs"), lit(16)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 16)
    // direct math check against the scala implementation
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val expected = graft.functions.SketchMath
      .minhash(new GenericArrayData(Array(10L, 20L, 30L)), 16)
      .toLongArray().toSeq
    assert(sigs(1L) == expected)
  }

  test("native simhash64: near-identical token sets have small hamming distance") {
    graft.functions.GraftFunctions.register(spark)
    val base = (1 to 60).map(_.toLong * 7919).toArray
    val nearDup = base.dropRight(2) :+ 123456789L :+ 987654321L
    val far = (1 to 60).map(_.toLong * 104729 + 3).toArray
    val df = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("id", "hs")
    val fps = df.select(col("id"), call_function("simhash64", col("hs")).as("fp"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
    assert(ham(fps(1L), fps(2L)) <= 12)
  }

  // ---- TeamDraft.draftPicks: hand-worked fixtures for the fixed-coin
  // team-draft simulation behind q_interleave_teamdraft/_winrate ----

  test("team draft: a stolen favorite falls through to the team's next rank") {
    // lex top-5: 10,11,12,13,14; dense top-5: 10,20,11,21,22 (shares 10,11)
    val cands = Seq(
      (7L, 10L, 1, true), (7L, 11L, 2, true), (7L, 12L, 3, true),
      (7L, 13L, 4, true), (7L, 14L, 5, true),
      (7L, 10L, 1, false), (7L, 20L, 2, false), (7L, 11L, 3, false),
      (7L, 21L, 4, false), (7L, 22L, 5, false))
    val picks = graft.operators.TeamDraft.draftPicks(7L, cands.iterator).toSeq
    // worked by hand: lex drafts 10; dense wants 10 (taken) → 20;
    // lex 11; dense wants 11 (taken) → 21; lex 12; dense 22
    assert(picks == Seq(
      (7L, 10L, 1L, "lex"), (7L, 20L, 2L, "dense"),
      (7L, 11L, 3L, "lex"), (7L, 21L, 4L, "dense"),
      (7L, 12L, 5L, "lex"), (7L, 22L, 6L, "dense")))
  }

  test("team draft: an exhausted team yields no pick but positions still advance") {
    // dense has only 3 candidates, all inside lex's list
    val cands = Seq(
      (1L, 1L, 1, true), (1L, 2L, 2, true), (1L, 3L, 3, true),
      (1L, 4L, 4, true), (1L, 5L, 5, true),
      (1L, 1L, 1, false), (1L, 2L, 2, false), (1L, 3L, 3, false))
    val picks = graft.operators.TeamDraft.draftPicks(1L, cands.iterator).toSeq
    // lex 1; dense (1 taken) → 2; lex (2 taken) → 3; dense empty → NO
    // pos-4 row; lex 4; dense still empty → no pos-6 row
    assert(picks == Seq(
      (1L, 1L, 1L, "lex"), (1L, 2L, 2L, "dense"),
      (1L, 3L, 3L, "lex"), (1L, 4L, 5L, "lex")))
  }

  test("team draft: equal ranks break by doc_id ascending (the oracle's ORDER BY)") {
    val cands = Seq((2L, 30L, 1, true), (2L, 9L, 1, true), (2L, 40L, 1, false))
    val picks = graft.operators.TeamDraft.draftPicks(2L, cands.iterator).toSeq
    assert(picks.head == ((2L, 9L, 1L, "lex")))
    assert(picks(1) == ((2L, 40L, 2L, "dense")))
    assert(picks(2) == ((2L, 30L, 3L, "lex")))
  }

  test("team draft equals the step-wise argmin formulation on random pools") {
    // independent reference: the six-step formulation the oracle unrolls
    // (and the pre-rewrite Spark plan executed) — for k = 1..6, the
    // odd/even team's argmin over (rank, doc_id) excluding all picks so
    // far, position advancing whether or not a pick lands
    def stepwise(qid: Long, cands: Seq[(Long, Long, Int, Boolean)])
        : Seq[(Long, Long, Long, String)] = {
      var picked = Set.empty[Long]
      (1 to 6).flatMap { k =>
        val isLex = k % 2 == 1
        val pick = cands.filter(c => c._4 == isLex && !picked.contains(c._2))
          .sortBy(c => (c._3, c._2)).headOption
        pick.foreach(c => picked += c._2)
        pick.map(c => (qid, c._2, k.toLong, if (isLex) "lex" else "dense"))
      }
    }
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 200) {
      // overlapping doc pools with duplicate ranks and uneven list sizes
      val nLex = rnd.nextInt(6) // 0..5
      val nDen = rnd.nextInt(6)
      val docPool = (1 to 8).map(_.toLong)
      def list(n: Int, isLex: Boolean) =
        rnd.shuffle(docPool).take(n).zipWithIndex.map { case (d, i) =>
          (trial.toLong, d, 1 + rnd.nextInt(3) * (i % 2) + i / 2, isLex)
        }
      val cands = list(nLex, isLex = true) ++ list(nDen, isLex = false)
      val got = graft.operators.TeamDraft.draftPicks(trial.toLong, cands.iterator).toSeq
      assert(got == stepwise(trial.toLong, cands), s"trial $trial pool $cands")
      // structural invariants: no doc drafted twice, positions strictly
      // increasing, odd positions lex / even dense
      assert(got.map(_._2).distinct.size == got.size)
      assert(got.map(_._3) == got.map(_._3).sorted)
      assert(got.forall(p => (p._3 % 2 == 1) == (p._4 == "lex")))
    }
  }
}
