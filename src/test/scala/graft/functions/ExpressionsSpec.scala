package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Multimodal

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash64: deterministic, order-sensitive, null-safe") {
    val df = Seq(("ab"), ("ba"), ("ab")).toDF("s")
      .select(GraftExpressions.rolling_hash64($"s").as("h")).collect()
    assert(df(0).getLong(0) == df(2).getLong(0))
    assert(df(0).getLong(0) != df(1).getLong(0))
    // known value: h("ab") = ('a' * B + 'b') with B = 1000003
    assert(df(0).getLong(0) == 97L * 1000003L + 98L)
    val n = Seq((null: String)).toDF("s")
      .select(GraftExpressions.rolling_hash64($"s")).collect()
    assert(n.head.isNullAt(0))
  }

  test("simhash64: equal token arrays hash equal; null-safe") {
    val df = Seq(
      Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("x", "y", "z")
    ).toDF("t").select(GraftExpressions.simhash64($"t").as("h")).collect()
    assert(df(0).getLong(0) == df(1).getLong(0))
    assert(df(0).getLong(0) != df(2).getLong(0))
  }

  test("byte_histogram: counts sum to payload length, 16 bins") {
    val df = Seq("hello world!", "").toDF("s")
      .select(GraftExpressions.byte_histogram($"s".cast("binary")).as("h"))
      .collect()
    val h0 = df(0).getSeq[Long](0)
    assert(h0.length == 16 && h0.sum == 12L)
    assert(df(1).getSeq[Long](0).sum == 0L)
  }

  test("sig_agreement: agreement fraction, null-safe, length-robust") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L)), // 2/4 agree
      (Seq(1L, 2L), Seq(1L, 2L)),                 // all agree
      (Seq(1L, 2L, 3L), Seq(1L, 2L))              // shorter side wins: 2/2
    ).toDF("a", "b")
      .select(GraftExpressions.sig_agreement($"a", $"b").as("j")).collect()
    assert(df(0).getDouble(0) == 0.5)
    assert(df(1).getDouble(0) == 1.0)
    assert(df(2).getDouble(0) == 1.0)
    val n = Seq((Seq(1L), null: Seq[Long])).toDF("a", "b")
      .select(GraftExpressions.sig_agreement($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
    // interpreted eval (no-codegen context) agrees with codegen
    val expr = GraftExpressions.SigAgreement(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1L, 2L, 3L, 4L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1L, 9L, 3L, 8L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(expr.eval(null) == 0.5)
  }

  test("kr_minhash_signature matches the HOF affine-permutation form; interpreted == codegen") {
    val docs = Seq((0L, "the quick brown fox jumps over the lazy dog again"),
      (1L, "short"), (2L, "")).toDF("doc_id", "text")
    val sh = graft.ops.Dedup.shingles($"text", 3)
    val native = docs.orderBy($"doc_id")
      .select(GraftExpressions.kr_minhash_signature(sh, 8).as("sig"))
      .collect().map(_.getSeq[Long](0))
    // the HOF formulation that the dedup_minhash_sig oracle replays
    val P = 2147483647L
    val consts = (0 until 8).map { j =>
      val a = Iterator.iterate(1L)(x => x * 48271L % P).drop(j + 1).next()
      (a, (j + 1) * 2654435761L % P)
    }
    val hofCols = consts.zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(sh, s => pmod(
        pmod(GraftExpressions.rolling_hash64(s), lit(P)) * a + b, lit(P)))).as(s"h$j")
    }
    val viaHof = docs.orderBy($"doc_id").select(hofCols: _*)
      .collect().map(r => (0 until 8).map(r.getLong))
    assert(native.map(_.toSeq).toSeq == viaHof.map(_.toSeq).toSeq)
    // interpreted eval (no-codegen context) agrees with the codegen path
    val expr = GraftExpressions.KrMinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array("the quick brown", "quick brown fox"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)), 8)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaDf = Seq(Seq("the quick brown", "quick brown fox")).toDF("sh")
      .select(GraftExpressions.kr_minhash_signature($"sh", 8))
      .collect().head.getSeq[Long](0)
    assert(interp == viaDf)
  }

  test("explode_shingles generator matches the array-expression shingles") {
    val docs = Seq(
      (0L, "The quick  brown Fox jumps"),
      (1L, "two words"),   // shorter than n -> one whole-text shingle
      (2L, "")             // empty -> one empty shingle
    ).toDF("doc_id", "text")
    val viaGen = docs.select($"doc_id",
      GraftExpressions.explode_shingles($"text", 3).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaArray = docs.select($"doc_id",
      explode(graft.ops.Dedup.shingles($"text", 3)).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(viaGen == viaArray)
    assert(viaGen.count(_._1 == 0L) == 3) // 5 words -> 3 trigrams
    assert(viaGen.filter(_._1 == 1L).map(_._2) == Seq("two words"))
  }

  test("shingles_array is byte-identical to the original HOF composition") {
    // the exact built-in composition Dedup.shingles used before round 7 —
    // the form every shingle-consumer oracle was recorded against
    def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val words = split(lower(trim(text)), "\\s+")
      when(size(words) < n, array(concat_ws(" ", words)))
        .otherwise(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))
    }
    val docs = Seq(
      "The quick  brown Fox jumps",  // double space collapses
      " leading and trailing ",      // ASCII-space trim
      "\ttab  lead mid\nand end\n",  // non-space whitespace survives trim
      "two words",                   // shorter than n
      "",                            // empty
      "   ",                         // spaces only
      "MIXED Case nbsp tokens here" // NBSP is not \s
    ).toDF("text")
    val native = docs.select(GraftExpressions.shingles_array($"text", 3))
      .collect().map(_.getSeq[String](0))
    val hof = docs.select(hofShingles($"text", 3))
      .collect().map(_.getSeq[String](0))
    assert(native.map(_.toList).toList == hof.map(_.toList).toList)
    // null in -> null out, interpreted == codegen
    val nul = Seq((null: String)).toDF("text")
      .select(GraftExpressions.shingles_array($"text", 3)).collect()
    assert(nul.head.isNullAt(0))
    val expr = GraftExpressions.ShinglesArray(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "a b c d", org.apache.spark.sql.types.StringType), 2)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(interp == Seq("a b", "b c", "c d"))
  }

  test("shingle_overlap_count matches the explode/broadcast-join form") {
    val bench = Array("the quick brown", "lazy dog flees", "not present xx")
    val docs = Seq(
      (0L, Seq("the quick brown", "quick brown fox", "lazy dog flees")),
      (1L, Seq("nothing matches", null)),
      (2L, Seq.empty[String])
    ).toDF("doc_id", "sh")
    val got = docs.select($"doc_id",
      GraftExpressions.shingle_overlap_count($"sh", bench).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 2L, 1L -> 0L, 2L -> 0L))
    // null array -> null out
    val nul = Seq((0L, null: Seq[String])).toDF("doc_id", "sh")
      .select(GraftExpressions.shingle_overlap_count($"sh", bench)).collect()
    assert(nul.head.isNullAt(0))
    // interpreted eval agrees with codegen
    val expr = GraftExpressions.ShingleOverlapCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array("a b c", "d e f"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      Array("d e f"))
    assert(expr.eval(null) == 1L)
  }

  test("char_class_stats / stopword_stats match the regex and HOF compositions") {
    val docs = Seq(
      "Hello, WORLD! 123 añé für one-two_three",
      "一二三 mixed 中文 and ascii 9fff edge 鿿ꀀ", // CJK boundary
      "١٢٣ arabic digits Ⅷ roman numeral", // Nd not 0-9; Nl
      "\ttabs\nand newlines\f\r mixed   runs",
      " leading trailing ", "", "    ", "a", "abcde fghi j",
      "the a of and to la de und pour THE The"
    ).toDF("text")
    val cc = GraftExpressions.char_class_stats($"text")
    val got = docs.select(
      element_at(cc, 1), element_at(cc, 2), element_at(cc, 3),
      element_at(cc, 4), element_at(cc, 5), element_at(cc, 6),
      element_at(cc, 7)).collect().map(r => (0 until 7).map(r.getInt))
    val want = docs.select(
      length($"text"),
      length(regexp_replace($"text", "[^\\p{L}]", "")),
      length(regexp_replace($"text", "[^0-9]", "")),
      length(regexp_replace($"text", "[\\p{L}\\p{N}\\s]", "")),
      length(regexp_replace($"text", "[^\\u4e00-\\u9fff]", "")),
      size(filter(split($"text", "[^\\p{L}\\p{N}]+"), p => length(p) > 0)),
      size(filter(split($"text", "[^\\p{L}\\p{N}]+"), p => length(p) > 4))
    ).collect().map(r => (0 until 7).map(r.getInt))
    assert(got.map(_.toList).toList == want.map(_.toList).toList)

    val sets = Seq(
      Seq("the", "a", "of", "and", "to"),
      Seq("le", "la", "de", "und", "pour"))
    val sw = GraftExpressions.stopword_stats($"text", sets)
    val gotSw = docs.select(
      element_at(sw, 1), element_at(sw, 2), element_at(sw, 3))
      .collect().map(r => (0 until 3).map(r.getInt))
    val toks = split(lower(trim($"text")), "\\s+")
    val wantSw = docs.select(
      size(toks),
      size(filter(toks, t => t.isInCollection(sets(0)))),
      size(filter(toks, t => t.isInCollection(sets(1)))))
      .collect().map(r => (0 until 3).map(r.getInt))
    assert(gotSw.map(_.toList).toList == wantSw.map(_.toList).toList)

    // null in -> null out; interpreted eval agrees with codegen
    val nul = Seq((null: String)).toDF("text")
      .select(GraftExpressions.char_class_stats($"text"),
        GraftExpressions.stopword_stats($"text", sets)).collect()
    assert(nul.head.isNullAt(0) && nul.head.isNullAt(1))
    val ccE = GraftExpressions.CharClassStats(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "ab1, 一", org.apache.spark.sql.types.StringType))
    assert(ccE.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray.toSeq == Seq(6, 3, 1, 1, 1, 2, 0))
    val swE = GraftExpressions.StopwordStats(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "The la x", org.apache.spark.sql.types.StringType), sets)
    assert(swE.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray.toSeq == Seq(3, 1, 1))
  }

  test("expressions are SQL-registered and callable from spark.sql") {
    GraftExpressions.register(spark)
    val r = spark.sql(
      "SELECT rolling_hash64('ab') AS h, simhash64(array('a','b')) AS s").collect().head
    assert(r.getLong(0) == 97L * 1000003L + 98L)
  }

  test("decodeImage parses hand-built real PNG and JPEG headers exactly") {
    // PNG 640×480 RGBA (color type 6), built byte-for-byte to spec
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val png: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    // baseline JPEG 320×200, 3 components, with an APP0 segment BEFORE
    // the SOF so the segment walk has something to skip
    val app0: Array[Byte] = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes ++ Array.fill[Byte](10)(0)
    val sof: Array[Byte] = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(200) ++ be16(320) ++ Array[Byte](3) ++
      Array.fill[Byte](9)(1)
    val jpeg: Array[Byte] = Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ sof
    val notAnImage = "plain text".getBytes

    // JVM reference parse
    assert(Multimodal.decodeBytes(png).contains(("png", 640, 480, 4)))
    assert(Multimodal.decodeBytes(jpeg).contains(("jpeg", 320, 200, 3)))
    assert(Multimodal.decodeBytes(notAnImage).isEmpty)

    // column-expression parse agrees (hex-substring arithmetic)
    val df = Seq((1L, png), (2L, jpeg), (3L, notAnImage)).toDF("media_id", "content")
    val cols = df.select($"media_id", Multimodal.decodeImage($"content").as("d"))
      .select($"media_id", $"d.format", $"d.width", $"d.height", $"d.channels")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    assert(cols(1L) == (("png", 640, 480, 4)))
    assert(cols(2L) == (("jpeg", 320, 200, 3)))
    assert(cols(3L) == ((null, -1, -1, -1)))
  }

  test("batched decode agrees with the column decode over the synthesized image corpus") {
    val media = Multimodal.asImageTable(
      Seq((1L, "payload one"), (2L, "a different payload"), (3L, "third"))
        .toDF("doc_id", "text"))
    val viaExpr = Multimodal.extractAll(media)
      .select($"media_id", $"decoded.format", $"decoded.width",
        $"decoded.height", $"decoded.channels")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val viaBatch = Multimodal.decodeBatched(media, batchSize = 2)
      .collect().map(d => d.media_id -> ((d.format, d.width, d.height, d.channels))).toMap
    assert(viaBatch == viaExpr && viaBatch.size == 3)
    // even ids synthesize PNG, odd JPEG — and the parse round-trips
    assert(viaBatch(2L)._1 == "png" && viaBatch(1L)._1 == "jpeg")
  }

  test("multimodal extract pipeline: deterministic decode, frames, features") {
    val media = Multimodal.asImageTable(
      Seq((7L, "some fake binary payload for the decoder")).toDF("doc_id", "text"))
    val r1 = Multimodal.extractAll(media)
      .select("decoded.width", "decoded.height", "decoded.channels", "n_frames")
      .collect().head
    val r2 = Multimodal.extractAll(media)
      .select("decoded.width", "decoded.height", "decoded.channels", "n_frames")
      .collect().head
    assert(r1 == r2) // header synthesis + parse is deterministic
    assert(r1.getInt(0) >= 1 && r1.getInt(0) <= 1920)
    assert(r1.getInt(1) >= 1 && r1.getInt(1) <= 1080)
    assert(r1.getInt(3) == 4)
    val feats = Multimodal.extractAll(media).select("features").collect()
      .head.getSeq[Double](0)
    assert(feats.length == 16 && math.abs(feats.sum - 1.0) < 1e-9)
  }

  test("pq_encode rejects corrupt vectors loudly: wrong length, null element") {
    // A wrong-length or null-holding vector is corrupt input; the old
    // min-clamp silently zero-padded it into a plausible-but-wrong code
    // (and a null element read as 0.0 under codegen but NPE'd
    // interpreted — divergent). Both must throw, in BOTH eval modes.
    val codebook = Array.tabulate(2 * 2 * 2)(_.toLong) // m=2, ksub=2, subDim=2
    def run(vecs: Seq[Seq[Option[Float]]], codegen: Boolean): Unit = {
      val df = vecs.toDF("v")
        .select(GraftExpressions.pq_encode($"v", codebook, 2, 2, 2).as("c"))
      val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
      val prevWscg = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try df.collect() finally {
        spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
        spark.conf.set("spark.sql.codegen.wholeStage", prevWscg)
      }
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val good = Seq(Seq[Option[Float]](Some(1f), Some(2f), Some(3f), Some(4f)))
    val short = Seq(Seq[Option[Float]](Some(1f), Some(2f)))
    val nullEl = Seq(Seq[Option[Float]](Some(1f), None, Some(3f), Some(4f)))
    for (cg <- Seq(true, false)) {
      run(good, cg) // sanity: a well-formed vector encodes fine
      val e1 = intercept[Exception] { run(short, cg) }
      assert(messages(e1).contains("vector length"), s"cg=$cg: ${messages(e1)}")
      val e2 = intercept[Exception] { run(nullEl, cg) }
      assert(messages(e2).contains("null element"), s"cg=$cg: ${messages(e2)}")
    }
  }

  test("BMP: the JDK's own ImageIO decodes the synthesized container; frames are the genuine bytes") {
    val text = "hello bmp world — this payload spans more than forty-eight " +
      "bytes so the image gets several real pixel rows"
    val docs = Seq((1L, text), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.asBmpTable(docs)
    val blob = media.where($"media_id" === 1L)
      .select($"content").as[Array[Byte]].head()
    // INDEPENDENT decoder: the stock JDK reads our bytes as a real BMP
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    assert(img != null, "ImageIO must decode the synthesized BMP")
    val payload = text.getBytes("UTF-8")
    val h = (payload.length + 47) / 48
    assert(img.getWidth == 16 && img.getHeight == h)
    // every pixel's RGB equals the payload bytes at the real bottom-up
    // offsets (file stores B,G,R per pixel; first file row = bottom)
    def at(i: Int) = if (i < payload.length) payload(i) & 0xff else 0
    for (y <- 0 until h; x <- 0 until 16) {
      val rgb = img.getRGB(x, y)
      val p = (h - 1 - y) * 48 + 3 * x
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
        ((at(p + 2), at(p + 1), at(p))), s"pixel ($x,$y) diverged")
    }
    // header parse reads the little-endian fields back exactly
    val d = media.where($"media_id" === 1L)
      .select(Multimodal.decodeBmp($"content").as("d")).select($"d.*").head()
    assert((d.getInt(0), d.getInt(1), d.getInt(2), d.getInt(3),
      d.getInt(4)) == ((54, 16, h, 24, 0)))
    // frame extraction returns the genuine content: bottom-up
    // reassembly is byte-identical to the zero-padded payload
    val frames = Multimodal.bmpFrames(media).where($"media_id" === 1L)
      .orderBy($"row_idx".desc).select("row_hex").as[String]
      .collect().mkString
    val paddedHex = payload.map("%02X".format(_)).mkString
      .padTo(h * 96, '0').mkString
    assert(frames == paddedHex,
      "bmpFrames must extract the exact payload bytes")
    // the 1-byte doc still yields one (padded) row
    assert(Multimodal.bmpFrames(media).where($"media_id" === 2L)
      .count() == 1)
  }

  test("WAV: the JDK's own AudioSystem decodes the synthesized container; stats are the genuine samples") {
    val text = "genuine audio payload — sixteen-bit little-endian " +
      "samples decoded from these very bytes"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val media = Multimodal.asWavTable(docs)
    val blob = media.select($"content").as[Array[Byte]].head()
    // INDEPENDENT decoder: the stock JDK reads our bytes as a real WAV
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val payload = text.getBytes("UTF-8")
    val ds = payload.length + (payload.length % 2)
    assert(ais.getFrameLength == ds / 2)
    val data = ais.readAllBytes()
    assert(data.take(payload.length).toSeq == payload.toSeq,
      "the PCM data must be the document bytes")
    // wavStats parity with a direct JVM fold over the same samples
    val st = media.select(Multimodal.wavStats($"content").as("s"))
      .select($"s.*").head()
    val samples = (0 until ds / 2).map { i =>
      def at(j: Int) = if (j < payload.length) payload(j) & 0xff else 0
      val v = (at(2 * i + 1) << 8) | at(2 * i)
      if (v >= 32768) v - 65536 else v
    }
    assert(st.getInt(0) == ds / 2)
    assert(st.getLong(1) == (ds / 2) * 1000L / 8000L)
    assert(st.getLong(2) == samples.map(math.abs).max.toLong)
    assert(st.getLong(3) == samples.map(s => s.toLong * s).sum)
  }

  test("AVI: the chunk walk extracts frames whose JPEG headers parse and whose bytes are the slices") {
    val text = "video frames carved from this document's bytes — four " +
      "slices, each framed as a header-real baseline JPEG chunk"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Multimodal.aviFrames(Multimodal.asAviTable(docs))
      .orderBy($"frame_idx").collect()
    assert(out.length == 4)
    val payload = text.getBytes("UTF-8")
    val fs = (payload.length + 3) / 4
    val phex = payload.map("%02X".format(_)).mkString
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("format") == "jpeg", s"frame $i format")
      // dims round-trip: synthesized from md5(payload_hex || i), read
      // back by parsing the extracted frame's SOF bytes
      val m = md5Of(phex + i)
      assert(r.getAs[Int]("width") ==
        (BigInt(m.substring(0, 8), 16) % 1920 + 1).toInt, s"frame $i w")
      assert(r.getAs[Int]("height") ==
        (BigInt(m.substring(8, 16), 16) % 1080 + 1).toInt, s"frame $i h")
      // content round-trip: the carried slice is the genuine bytes
      val slice = phex.slice(i * fs * 2, (i + 1) * fs * 2)
        .padTo(fs * 2, '0').mkString
      assert(r.getAs[String]("slice_md5") == md5Of(slice), s"frame $i slice")
    }
  }
}
