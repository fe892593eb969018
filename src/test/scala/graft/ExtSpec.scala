package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis
import graft.multimodal.Multimodal

class ExtSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different words about spark engines and logs here")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one representative per identical text") {
    val out = Dedup.exact(docs, col("doc_id"), col("text"))
    assert(out.count() == 3)
    assert(!out.select("doc_id").as[Long].collect().contains(3L))
  }

  test("minhash LSH surfaces the near-dup pair with high jaccard") {
    val out = Dedup.minhashLsh(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = out.find(p => p._1 == 1L && p._2 == 3L)
    assert(exact.exists(_._3 == 1.0), s"exact dup pair missing: $out")
    val near = out.find(p => p._1 == 1L && p._2 == 2L)
    assert(near.exists(_._3 > 0.5), s"near dup pair missing: $out")
    assert(!out.exists(p => p._2 == 4L && p._3 > 0.3), s"false positive: $out")
  }

  test("simhash64: identical docs share signatures, different docs do not") {
    val sh = Dedup.simhash64(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(3L))
    assert(sh(1L) != sh(4L))
    val hamming12 = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val hamming14 = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(hamming12 < hamming14, s"near-dup hamming $hamming12 !< $hamming14")
  }

  test("pq encode picks the nearest codeword per subspace, byte-packed") {
    // m=2 subspaces of 2 dims; codeword 0 = x-axis, 1 = y-axis in each
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      (0L, Array(0.9, 0.1, 0.1, 0.9)), // → codes (0, 1)
      (1L, Array(0.1, 0.8, 0.9, 0.0))  // → codes (1, 0)
    ).toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(vecs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes")).toMap
    assert(enc(0L).toSeq == Seq[Byte](0, 1), enc(0L).toSeq)
    assert(enc(1L).toSeq == Seq[Byte](1, 0), enc(1L).toSeq)
  }

  test("pq ADC top-k ranks the aligned vector above the orthogonal one") {
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 1.0, 0.0)),
      (1L, Array(0.9, 0.1, 0.8, 0.1)), // same cell as 0
      (2L, Array(0.0, 1.0, 0.0, 1.0))  // orthogonal
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 2, books).orderBy("rank").collect()
    assert(out(0).getAs[Long]("cid") == 1L, out.mkString(","))
    assert(out(0).getAs[Long]("score") > out(1).getAs[Long]("score"))
  }

  test("brute-force cosine top-k finds the planted neighbor first") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.99, 0.1, 0.0)), // near 0
      (2L, Array(0.0, 1.0, 0.0)),
      (3L, Array(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(out(0).getAs[Long]("cid") == 1L)
    assert(out(0).getAs[Double]("cos") > 0.99)
  }

  test("IVF: vectors assign to their nearest centroid; search stays in-cell") {
    // two well-separated cells around orthogonal centroids 0 and 10
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)),   // centroid of cell A (vec_id % 10 == 0)
      (1L, Array(0.9, 0.1, 0.0)),   // cell A
      (2L, Array(0.95, 0.05, 0.0)), // cell A
      (10L, Array(0.0, 1.0, 0.0)),  // centroid of cell B
      (11L, Array(0.1, 0.9, 0.0))   // cell B
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") % 10 === 0)
    val assign = Similarity.ivfAssign(vecs, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign(1L) == 0L && assign(2L) == 0L)
    assert(assign(11L) == 10L)
    assert(assign(0L) == 0L && assign(10L) == 10L) // centroids self-assign

    val hits = Similarity.ivfTopK(vecs, cents,
      vecs.filter(col("vec_id") === 1), "vec_id", "embedding", k = 5, nprobe = 1)
      .collect().map(_.getAs[Long]("cid")).toSet
    assert(hits == Set(0L, 2L)) // nprobe=1: only cell-A mates, never cell B

    // nprobe=2 probes the second-best centroid too: cell-B members become
    // reachable candidates (ranked below the cell-A mates).
    val hits2 = Similarity.ivfTopK(vecs, cents,
      vecs.filter(col("vec_id") === 1), "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(_.getAs[Long]("cid")).toSet
    assert(hits2 == Set(0L, 2L, 10L, 11L), s"nprobe=2 hits: $hits2")
  }

  test("simhash banded-hamming pairs: exact dup found, unrelated doc excluded") {
    val pairs64 = Dedup.simhashPairs64(
      Dedup.simhash64(docs, col("doc_id"), col("text")), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs64.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0),
      s"exact dup pair missing: ${pairs64.toSeq}")
    assert(!pairs64.exists(p => p._2 == 4L), s"unrelated doc paired: ${pairs64.toSeq}")
    val pairs16 = Dedup.simhashPairs16(
      Dedup.simhash16(docs, col("doc_id"), col("text")), maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs16.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0))
    // thresholds beyond the banding guarantee are a config error, not a
    // silent recall loss
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs16(
        Dedup.simhash16(docs, col("doc_id"), col("text")), maxHamming = 3)
    }
  }

  test("lsh signature buckets similar vectors together") {
    val vecs = Seq(
      (0L, (0 until 64).map(i => math.sin(i).toFloat).toArray),
      (1L, (0 until 64).map(i => (math.sin(i) * 1.01).toFloat).toArray),
      (2L, (0 until 64).map(i => math.cos(i * 3).toFloat).toArray)
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val sigs = Similarity.lshSignature(vecs, "vec_id", "embedding", 8, 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs(0L) == sigs(1L)) // scaled copy: identical signs
    assert(sigs.values.forall(_.length == 8))
  }

  test("lsh bucket cap drops hot buckets; second table recovers recall") {
    // 40 near-identical vectors collapse into one hot bucket per table;
    // two distinct planted vectors land elsewhere.
    val hot = (0 until 40).map(i =>
      (i.toLong, (0 until 64).map(d => 1.0 + 1e-9 * i * d).toArray))
    val vecs = (hot ++ Seq(
      (100L, (0 until 64).map(d => math.sin(d + 1)).toArray),
      (101L, (0 until 64).map(d => math.sin(d + 1) * 1.01).toArray)
    )).toDF("vec_id", "embedding")
    val capped = Similarity.lshTopK(vecs, "vec_id", "embedding",
      nPlanes = 8, dims = 64, k = 3, nTables = 2, bucketCap = Some(10))
    // the hot cluster's pairs are gone (bucket > cap in every table)…
    assert(capped.filter(col("qid") < 40 && col("cid") < 40).count() == 0)
    // …but the small planted pair survives in an un-capped bucket
    assert(capped.filter(col("qid") === 100 && col("cid") === 101).count() == 1)
    // and no surviving bucket exceeded the cap
    val sizes = Similarity.bucketSizes(vecs, "vec_id", "embedding", 8, 64, 2)
    assert(sizes.filter(col("n") > 10).count() > 0) // fixture really is skewed
  }

  test("text quality and token metrics on a known string") {
    val d = Seq((1L, "the cat sat on the mat.")).toDF("doc_id", "text")
    val q = TextAnalysis.quality(d, col("doc_id"), col("text")).collect().head
    assert(q.getAs[Int]("n_words") == 6)
    assert(q.getAs[Int]("n_punct") == 1)
    val t = TextAnalysis.tokenCounts(d, col("doc_id"), col("text")).collect().head
    assert(t.getAs[Int]("ws_tokens") == 6)
    assert(t.getAs[Int]("bpe_tokens") == 7) // 6 words + '.'
  }

  test("fingerprint is order-sensitive") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
  }

  test("nfc normalize: ascii identity, precompose, already-normalized passthrough") {
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NfcNormalize.compute(ascii) eq ascii) // zero-alloc fast path
    val composed = UTF8String.fromString("café")
    assert(NfcNormalize.compute(composed) eq composed) // already NFC
    val combining = UTF8String.fromString("cafe\u0301")
    assert(NfcNormalize.compute(combining).toString == "café")
    // compatibility chars survive NFC (it is not NFKC)
    val ligature = UTF8String.fromString("ﬁle")
    assert(NfcNormalize.compute(ligature).toString == "ﬁle")
  }

  test("unicode clean strips controls, maps nbsp, collapses runs, trims") {
    val d = Seq((1L, "a\u0007b  c\u00a0d  "), (2L, "ok")).toDF("doc_id", "text")
    val out = TextAnalysis.unicodeClean(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "ab c d")
    assert(out(1L).getInt(4) == 0 && out(1L).getInt(5) == 1)
    assert(out(2L).getString(1) == "ok" && out(2L).getInt(5) == 0)
  }

  test("sequence packing: contiguous intervals, boundary docs straddle") {
    // 6 docs of 100 tokens in one shard, seqLen 256: the stream is
    // 600 tokens = sequences [0,256) [256,512) [512,600…); every doc
    // interval must be contiguous with its predecessor and chunk ids
    // must follow from integer div
    val text = Seq.fill(100)("w").mkString(" ")
    val d = (1L to 6L).map(i => (i, text)).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(d, col("doc_id"), col("text"),
      seqLen = 256, nShards = 1)
      .orderBy("tok_begin").collect()
    assert(out.map(_.getAs[Long]("n_tokens")).forall(_ == 100L))
    val begins = out.map(_.getAs[Long]("tok_begin"))
    val ends = out.map(_.getAs[Long]("tok_end"))
    assert(begins.head == 0L && ends.last == 600L)
    assert(begins.tail.sameElements(ends.init)) // no gaps, no overlaps
    // the doc covering tokens [200,300) straddles sequences 0 and 1
    val straddler = out.find(r => r.getAs[Long]("tok_begin") == 200L).get
    assert(straddler.getAs[Long]("first_seq") == 0L)
    assert(straddler.getAs[Long]("last_seq") == 1L)
    assert(straddler.getAs[Long]("n_seqs") == 2L)
    assert(straddler.getAs[Long]("seq_offset") == 200L)
    // a doc fully inside one sequence does not straddle
    val inside = out.find(r => r.getAs[Long]("tok_begin") == 0L).get
    assert(inside.getAs[Long]("n_seqs") == 1L)
  }

  test("html unescape: named, numeric, malformed-verbatim, passthrough") {
    import graft.functions.HtmlUnescape
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = HtmlUnescape.compute(UTF8String.fromString(s)).toString
    assert(u("a &amp; b &lt;c&gt;") == "a & b <c>")
    assert(u("&#65;&#x42;&#x1F600;") == "AB😀") // astral hex ref
    assert(u("&bogus; &#; &#xzz; &amp tail") == "&bogus; &#; &#xzz; &amp tail")
    assert(u("5 & 6 &;") == "5 & 6 &;") // bare ampersands untouched
    assert(u("&quot;q&quot;&nbsp;x") == "\"q\" x")
    val plain = UTF8String.fromString("no entities here")
    assert(HtmlUnescape.compute(plain) eq plain) // zero-alloc passthrough
    // decoded output is never re-scanned (no double-decode)
    assert(u("&amp;amp;") == "&amp;")
  }

  test("html extract: strips head/script/style/comments/tags before decoding") {
    val d = Seq((1L,
      "<html><head><title>T</title></head><body><script>if(1<2){x()}" +
        "</script><!--n--><p>keep &lt;this&gt;</p></body></html>"))
      .toDF("doc_id", "html")
    val out = TextAnalysis.htmlExtract(d, col("doc_id"), col("html"))
      .collect().head
    assert(out.getString(1) == "keep <this>")
  }

  test("lm score: add-one bigram credits in exact fixed point") {
    // unigrams a=3 b=2 x=1, |V|=3; credit(a b)=1e6*3 div 6, credit(b a)=1e6*2 div 5
    val d = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 900000L)))
    assert(out(2L) == ((1L, 500000L)))
    assert(out(3L) == ((0L, 0L))) // no bigrams, still present
  }

  test("count-min sketch: estimates never undercount, exact when sparse") {
    val d = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val cms = graft.sketch.Sketches.countMinBuild(d, col("text"))
    assert(cms.map(_.sum).toSeq == Seq.fill(4)(7L)) // each row sees all 7 tokens
    val probe = Seq("a", "b", "c").toDF("token")
    val out = graft.sketch.Sketches
      .countMinEstimate(d, col("text"), probe, cms)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // 3 tokens in 4096 cells: no collisions, estimates exact
    assert(out == Map("a" -> ((4L, 4L, true)), "b" -> ((2L, 2L, true)),
      "c" -> ((1L, 1L, true))), out.toString)
  }

  test("asof join: latest-at-or-before semantics, null before first right") {
    import graft.ops.AsofJoin
    val mk = java.sql.Timestamp.valueOf(_: String)
    val left = Seq(
      (1L, 7L, mk("2026-01-01 10:00:00")), // before any purchase → null
      (2L, 7L, mk("2026-01-01 10:05:00")), // exact tie with p@10:05 → match
      (3L, 7L, mk("2026-01-01 10:30:00")), // after both → latest (10:20)
      (4L, 8L, mk("2026-01-01 11:00:00"))  // other key, no rights → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, mk("2026-01-01 10:05:00"), 5.0),
      (7L, mk("2026-01-01 10:20:00"), 9.0)
    ).toDF("user_id", "ts", "v")
      .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("v").as("p_v"))
    val out = AsofJoin.asofBackward(left, right, "user_id", "ts",
        Seq("p_ts", "p_v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.toString), Option(r.get(4)))).toMap
    assert(out(1L) == ((None, None)), out.toString)
    assert(out(2L)._2.contains(5.0), out.toString)
    assert(out(3L)._2.contains(9.0), out.toString)
    assert(out(4L) == ((None, None)), out.toString)
  }

  test("fuzzy join: near pairs surface, far pairs and hot grams do not") {
    val d = Seq(
      (1L, "the quick brown fox jumps here"),
      (2L, "the quick brown fox jumps hare"),  // dist 1 from 1
      (3L, "a completely unrelated sentence x"),
      (4L, "the quick brown fox jumps heri")   // dist 1 from 1, 2 from 2
    ).toDF("id", "s")
    val out = Dedup.editDistanceJoin(d, col("id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out == Map((1L, 2L) -> 1, (1L, 4L) -> 1, (2L, 4L) -> 2),
      out.toString)
    // a gram shared by more ids than the cap is a stop-gram: with cap 2
    // the three-way common prefix dies, so only pairs that ALSO share a
    // sub-cap gram survive — (1,4) agree through "...her" (grams with
    // id-count 2), while every gram (1,2) share is prefix-only
    val capped = Dedup.editDistanceJoin(d, col("id"), col("s"), hotGramCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 4L)), capped.toString)
  }

  test("property: fuzzy join equals brute-force levenshtein pairs") {
    // pigeonhole completeness holds for len >= q*(d+1)-1 = 23 at the
    // defaults — generate above it and the gram prefilter must lose
    // NOTHING: output == exhaustive all-pairs under the threshold.
    // A 3-letter alphabet forces heavy gram collisions (the prefilter's
    // worst case) so candidates >> true pairs.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strGen = Gen.choose(23, 32).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    // half fresh strings, half 1-2 edit mutants of a base — guarantees
    // true pairs exist in most rounds
    val corpusGen = Gen.listOfN(6, strGen).flatMap { bases =>
      Gen.sequence[List[String], String](bases.flatMap { b =>
        List(Gen.const(b),
          Gen.choose(0, b.length - 1).map(i => b.updated(i, 'x')))
      })
    }
    (1 to 6).foreach { seed =>
      val strs = corpusGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val expected = (for {
        (ia, sa) <- strs; (ib, sb) <- strs
        if ia < ib && lev(sa, sb) <= 2
      } yield (ia, ib, lev(sa, sb))).toSet
      val got = Dedup.editDistanceJoin(strs.toDF("id", "s"), col("id"),
          col("s"), hotGramCap = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected, s"seed $seed: got ${got.size}, " +
        s"expected ${expected.size}; diff ${(expected -- got).take(3)}")
    }
  }

  test("char_grams equals the composable distinct-substring form") {
    // the codegen CharGrams expression (r17) must be value-identical to
    // array_distinct(transform(sequence(...), substring)) — including
    // multi-byte characters (SQL substring slices by CHARACTER) and
    // below-q strings (empty array)
    val rows = Seq("abcdefgh", "aaaaaaaaaa", "короткий текст ётž",
      "ab", "", "the quick brown fox", "ééééééé").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    for (q <- Seq(2, 8)) {
      val d = rows.toDF("id", "s")
      val got = d.select(col("id"),
          graft.functions.TextFunctions.charGrams(col("s"), q).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      // the composable form is only defined for len >= q (sequence with
      // end < start counts DOWN); production filters those rows first,
      // and CharGrams returns an empty array for them
      val exp = d.filter(length(col("s")) >= q)
        .select(col("id"), array_distinct(expr(
          s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))"))
          .as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
        .withDefaultValue(Set.empty[String])
      assert(got.forall { case (k, v) => v == exp(k) }, s"q=$q")
    }
  }

  test("property: asof join equals brute-force latest-at-or-before") {
    import graft.ops.AsofJoin
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L)
    } yield (k, t)
    (1 to 5).foreach { seed =>
      val ls = Gen.listOfN(30, rowGen)(Gen.Parameters.default,
        Seed(seed.toLong)).get.distinct.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
      val rs = Gen.listOfN(20, rowGen)(Gen.Parameters.default,
        Seed(seed + 100L)).get.distinct  // distinct (k, t): ties are ill-defined
        .map { case (k, t) => (k, new java.sql.Timestamp(t * 1000), k * 1000 + t) }
      val left = ls.toDF("event_id", "k", "ts")
      val right = rs.toDF("k", "ts", "pay")
        .select(col("k"), col("ts"), col("ts").as("p_ts"), col("pay").as("p_v"))
      val got = AsofJoin.asofBackward(left, right, "k", "ts",
          Seq("p_ts", "p_v"))
        .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
      val expected = ls.map { case (id, k, ts) =>
        val cands = rs.filter(r => r._1 == k && !r._2.after(ts))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._2.getTime)._3))
      }.toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("property: interval join equals brute-force range filtering") {
    import graft.ops.AsofJoin
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for { k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 120L) }
      yield (k, t)
    (1 to 4).foreach { seed =>
      val ls = Gen.listOfN(20, rowGen)(Gen.Parameters.default,
        Seed(seed.toLong)).get.distinct.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
      val rs = Gen.listOfN(15, rowGen)(Gen.Parameters.default,
        Seed(seed + 50L)).get.distinct
        .map { case (k, t) => (k, new java.sql.Timestamp(t * 1000), k * 1000 + t) }
      val got = AsofJoin.intervalJoin(
          ls.toDF("lid", "k", "lts"),
          rs.toDF("rk", "rts", "pay"),
          col("k"), col("rk"), col("lts"), col("rts"), "30 SECONDS")
        .select("lid", "pay").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (lid, k, lts) <- ls; (rk, rts, pay) <- rs
        if rk == k && !rts.after(lts) &&
          rts.getTime >= lts.getTime - 30000L
      } yield (lid, pay)).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("property: exact quantiles equal sorted-list indexing") {
    import graft.ops.Quantiles
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    (1 to 5).foreach { seed =>
      val vs = Gen.listOfN(200, Gen.choose(1, 30))(Gen.Parameters.default,
        Seed(seed.toLong)).get
      val sorted = vs.sorted
      val got = Quantiles.exactQuantiles(vs.map(Tuple1(_)).toDF("v"),
          col("v"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      def at(num: Int, den: Int): Long =
        sorted((vs.size.toLong * num + den - 1) / den - 1 match {
          case i => i.toInt
        }).toLong
      val expected = Map("p50" -> at(1, 2), "p90" -> at(9, 10),
        "p99" -> at(99, 100), "p999" -> at(999, 1000))
      assert(got == expected, s"seed $seed: $got vs $expected")
    }
  }

  test("ohlc rollup: first/last by time, extremes, order-free sum") {
    import graft.ops.OhlcDownsample
    val mk = java.sql.Timestamp.valueOf(_: String)
    val d = Seq(
      (1L, "m", mk("2026-01-01 10:00:05"), 3.0),
      (2L, "m", mk("2026-01-01 10:00:01"), 7.0),  // earliest → open
      (3L, "m", mk("2026-01-01 10:00:59"), 1.0),  // latest → close, low
      (4L, "m", mk("2026-01-01 10:01:10"), 9.0)   // next bucket
    ).toDF("event_id", "k", "ts", "v")
    val out = OhlcDownsample(d, col("k"), col("ts"), col("event_id"),
        col("v"))
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    val b0 = java.time.Instant.parse("2026-01-01T10:00:00Z")
      .toEpochMilli * 1000
    assert(out(b0) == ((7.0, 7.0, 1.0, 1.0, 3L)), out.toString)
    assert(out(b0 + 60000000L) == ((9.0, 9.0, 9.0, 9.0, 1L)), out.toString)
  }

  test("exact quantiles: integer-ceiling ranks on a known histogram") {
    import graft.ops.Quantiles
    // 1..100 once each: p50=50, p90=90, p99=99, p999=⌈99.9⌉=100
    val d = (1 to 100).map(v => Tuple1(v)).toDF("v")
    val out = Quantiles.exactQuantiles(d, col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("p50" -> ((50L, 50L)), "p90" -> ((90L, 90L)),
      "p99" -> ((99L, 99L)), "p999" -> ((100L, 100L))), out.toString)
  }

  test("bounded-global guard: unbounded domain fails, window stays keyed") {
    import graft.ops.{BoundedGlobal, Quantiles}
    val wide = (1 to 100).map(v => Tuple1(v)).toDF("v")
    // past the cap the guard throws instead of silently serializing the
    // domain through the one-partition window
    val e = intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(wide, col("v"), cap = 50)
    }
    assert(e.getMessage.contains("quantize"))
    // the checked frames carry a (constant) partition key, so Spark's
    // "No Partition Defined" warning stays reserved for windows whose
    // boundedness nobody proved
    val hist = BoundedGlobal.bounded(
      wide.groupBy(col("v")).agg(count(lit(1)).as("cnt")), "spec", 1000)
    val cum = hist.withColumn("c",
      sum(col("cnt")).over(BoundedGlobal.cumFrame(col("v"))))
    // optimizedPlan: the EliminateWindowPartitions rule has already run
    // (it strips foldable keys — the reason constKey is hash-anchored),
    // and AQE doesn't hide the node the way executedPlan.collect does
    val wins = cum.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      cum.queryExecution.optimizedPlan.toString.take(2000))
    // and the keyed frame computes the same running sum
    val cums = cum.orderBy("v").collect().map(_.getAs[Long]("c"))
    assert(cums.toSeq == (1 to 100).map(_.toLong))
  }

  test("temperature mix: tail domains keep proportionally more than head") {
    val d = ((1 to 900).map(i => (i.toLong, "head")) ++
      (1 to 100).map(i => (1000L + i, "tail"))).toDF("doc_id", "dom")
    val out = TextAnalysis.temperatureMix(d, col("doc_id"), col("dom"))
    val kept = out.filter(col("kept")).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val headRate = kept.getOrElse("head", 0L).toDouble / 900
    val tailRate = kept.getOrElse("tail", 0L).toDouble / 100
    // α=0.5: tail keep-rate should be ≈ 3× head (√900/900 vs √100/100)
    assert(tailRate > headRate * 1.8,
      s"tail $tailRate not flattened above head $headRate")
    // thresholds are deterministic: same input → same keep set
    val again = TextAnalysis.temperatureMix(d, col("doc_id"), col("dom"))
      .filter(col("kept")).count()
    assert(again == kept.values.sum)
  }

  test("partition-layout invariance: same results under any repartition") {
    // the integer-exact designs (floor-sqrt weights, register max,
    // integer-ceiling ranks) must be immune to partitioning — a float
    // normalizer or order-sensitive sum would break this under skew
    import graft.sketch.Sketches
    import graft.ops.Quantiles
    val d = ((1 to 700).map(i => (i.toLong, "head", i % 40)) ++
      (1 to 90).map(i => (1000L + i, "tail", i % 25)))
      .toDF("doc_id", "dom", "v")
    def run(df: org.apache.spark.sql.DataFrame) = (
      TextAnalysis.temperatureMix(df, col("doc_id"), col("dom"))
        .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet,
      Sketches.hllRegisters(df, col("doc_id")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap,
      Quantiles.exactQuantiles(df, col("v")).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap)
    val a = run(d.repartition(1))
    val b = run(d.repartition(13, col("v")))
    val c = run(d.repartition(5, col("dom")))
    assert(a == b && b == c)
  }

  test("grouped hll and grouped quantiles match their per-group builds") {
    import graft.sketch.Sketches
    import graft.ops.Quantiles
    val d = ((0 until 900).map(i => ("a", s"k$i")) ++
      (0 until 400).map(i => ("b", s"j$i"))).toDF("g", "k")
    val grouped = Sketches.hllGroupedEstimate(d, col("g"), col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // each group's estimate equals the ungrouped estimator on its slice
    Seq("a", "b").foreach { g =>
      val solo = Sketches.hllEstimateFromRegs(
        Sketches.hllRegisters(d.filter(col("g") === g), col("k")))
        .collect().head.getLong(3)
      assert(grouped(g) == solo, s"group $g: ${grouped(g)} vs $solo")
    }
    val gq = Quantiles.groupedQuantiles(
      ((1 to 100).map(v => ("a", v)) ++ (1 to 10).map(v => ("b", v * 10)))
        .toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(gq(("a", "p50")) == 50L && gq(("a", "p99")) == 99L, gq.toString)
    assert(gq(("b", "p50")) == 50L && gq(("b", "p999")) == 100L, gq.toString)
  }

  test("hll: register merge of halves equals registers of the union") {
    import graft.sketch.Sketches
    val a = (0L until 400L).map(i => Tuple1(s"k$i")).toDF("k")
    val b = (200L until 600L).map(i => Tuple1(s"k$i")).toDF("k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, col("k")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (ra, rb) = (regs(a), regs(b))
    // element-wise max of the halves' registers IS the union's sketch —
    // the property that makes HLL shuffle-mergeable at any scale
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    assert(merged == regs(a.union(b)))
    // estimate lands within the 3-sigma gate the oracle asserts
    val est = Sketches.hllEstimate(a.union(b), col("k"))
      .select("est", "ok").collect().head
    assert(est.getBoolean(1), s"estimate ${est.getLong(0)} off >20% from 600")
  }

  test("substring dup: verbatim reuse flags, unique text does not") {
    val shared = ("x" * 200) // a 200-char verbatim block shared by 1 and 2
    val d = Seq(
      (1L, shared + " unique tail one"),
      (2L, shared + " other ending here"),
      (3L, (1 to 40).map(i => s"w$i").mkString(" ")) // all-unique windows
    ).toDF("doc_id", "text")
    val out = Dedup.substringDup(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(out(1L)._2 == 1, out.toString) // flagged: shared windows dup
    assert(out(2L)._2 == 1, out.toString)
    assert(out(3L) == ((0L, 0)), out.toString) // no dup windows at all
  }

  test("nb classifier: learns separable vocabularies, posterior decision") {
    // two disjoint vocabularies; the model must classify every doc by
    // its own class's tokens (trained and applied on the same corpus)
    val d = Seq(
      (1L, "alpha beta gamma alpha", true),
      (2L, "beta alpha beta gamma", true),
      (3L, "delta epsilon zeta zeta", false),
      (4L, "epsilon delta delta zeta", false)
    ).toDF("doc_id", "text", "is_en")
    val out = TextAnalysis.nbClassifier(d, col("doc_id"), col("text"),
      col("is_en"), posName = "pos", negName = "neg")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out == Map(1L -> "pos", 2L -> "pos", 3L -> "neg", 4L -> "neg"),
      out.toString)
  }

  test("perplexity buckets: thirds by avg credit, fluent doc lands head") {
    // same fixture as the lm score test: avg credits 450000 / 500000 / 0
    val d = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(2L) == ((500000L, "head")), out.toString)   // rank 1 of 3
    assert(out(1L) == ((450000L, "middle")), out.toString) // rank 2
    assert(out(3L) == ((0L, "tail")), out.toString)        // rank 3
  }

  test("bpe train: greedy merges with deterministic tie-break") {
    val d = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(d, col("text"), merges = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // "l o" and "o w" both count 4; pair-asc tiebreak picks "l o"
    assert(out(0) == ((1, "l o", "lo", 4L)))
    assert(out(1) == ((2, "lo w", "low", 4L)))
    // "low e" and "e r" both 1; asc picks "e r"
    assert(out(2) == ((3, "e r", "er", 1L)))
    assert(out(3) == ((4, "low er", "lower", 1L)))
  }

  test("stratified sample: exact keep-all / keep-none bounds, deterministic") {
    val d = (1L to 40L).map(i => (i, if (i % 4 == 0L) "de" else "en"))
      .toDF("doc_id", "lang")
    val all = TextAnalysis.stratifiedSample(d, col("doc_id"), col("lang"),
      target = 1000L)
    assert(all.count() == 40)
    assert(TextAnalysis.stratifiedSample(d, col("doc_id"), col("lang"),
      target = 0L).count() == 0)
    val once = TextAnalysis.stratifiedSample(d, col("doc_id"), col("lang"),
      target = 5L).select("doc_id").as[Long].collect().sorted.toSeq
    val twice = TextAnalysis.stratifiedSample(d, col("doc_id"), col("lang"),
      target = 5L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(once == twice)
  }

  test("chunk overlap: stride windows with clamped tail, short doc = 1 chunk") {
    val d = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" ")),
      (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkOverlap(d, col("doc_id"), col("text"),
      win = 4, stride = 3)
      .orderBy("doc_id", "chunk_ix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.count(_._1 == 1L) == 4)
    assert(out(0)._4 == "t1 t2 t3 t4")
    assert(out(1)._4 == "t4 t5 t6 t7")
    assert(out(3) == ((1L, 3L, 2L, "t10 t11"))) // tail clamped to 2 tokens
    assert(out(4) == ((2L, 0L, 2L, "a b")))
  }

  test("multimodal: stub decode is deterministic; frame sampling slices payload") {
    val media = Multimodal.ingest(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractFeatures(spark, media, dims = 4, parallelism = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.toSeq == feats(3L).feature.toSeq) // same payload
    assert(feats(1L).size_bytes == 43L)
    assert(feats(1L).mean_byte > 0)
    val frames = Multimodal.frameSample(media, frameBytes = 10, everyN = 2)
      .filter(col("media_id") === 1).select("frames").collect().head
      .getSeq[Array[Byte]](0)
    assert(frames.head.length == 10)
  }
}
