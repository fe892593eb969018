package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extensions): language-ID, quality scoring, token counting, document
  * fingerprinting. All pure column expressions — codegen-friendly,
  * map-only (no shuffles) at any scale.
  */
object TextAnalysis {

  private val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** n-gram/stopword-heuristic language ID: score = English function-word
    * hits; classify `en` above threshold. (Real corpora would carry a
    * per-language table; the mechanism — regexp hit counting per
    * language — is the operator.)
    */
  def enStopwordHits(text: Column): Column =
    size(regexp_extract_all(text, lit("\\b(" + EnStop.mkString("|") + ")\\b"), lit(0)))

  def languageId(text: Column, threshold: Int = 2): Column =
    when(enStopwordHits(text) >= threshold, lit("en")).otherwise(lit("other"))

  /** The composite quality score of [[quality]] as a bare column — the
    * ONE definition both the standalone operator and fused curation
    * passes share (r17: composing it into a single corpus scan replaces
    * a project-then-rejoin in `x_corpus_curate`).
    */
  def qualityScore(text: Column): Column = {
    val nWords = size(split(text, " "))
    val nStop = enStopwordHits(text)
    round(
      least(lit(1.0), nWords.cast("double") / 50) * lit(0.5) +
        least(lit(1.0), nStop.cast("double") * 10 / nWords) * lit(0.5),
      3)
  }

  /** Quality metrics: length, word count, average word length, stopword
    * ratio, punctuation count; composite score in [0,1] from exact
    * integer ratios (deterministic across engines).
    */
  def quality(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val nChars = length(text)
    val nWords = size(split(text, " "))
    val nStop = enStopwordHits(text)
    val nPunct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))
    df.select(
      idCol.as("doc_id"),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      round(nChars.cast("double") / nWords, 3).as("avg_word_len"),
      round(nStop.cast("double") / nWords, 3).as("stopword_ratio"),
      nPunct.as("n_punct"),
      qualityScore(text).as("quality_score"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-space symbols).
    */
  def tokenCounts(df: DataFrame, idCol: Column, text: Column): DataFrame =
    df.select(
      idCol.as("doc_id"),
      size(split(text, " ")).as("ws_tokens"),
      size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .as("bpe_tokens"))

  /** Corpus-wide top-k word n-grams — the vocabulary/boilerplate census
    * every training-data pipeline runs before filtering. Shingling runs
    * through the codegen [[graft.functions.WordShingles]] expression;
    * counting is one HashAggregate with map-side combine; top-k compiles
    * to TakeOrderedAndProject (per-partition partial top-k, k-row merge)
    * — no single node ever sorts the full vocabulary, so the plan holds
    * at any corpus size. Total-ordered (count desc, ngram asc) for
    * reproducibility.
    */
  def topNgrams(df: DataFrame, text: Column, n: Int, k: Int): DataFrame =
    df.select(explode(
        graft.functions.TextFunctions.wordShingles(text, n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /** Deterministic train/val/test assignment by stable content-free
    * hash — the split must survive reshuffles, retries and growing
    * corpora, so it hashes the document id, never position. Bucket =
    * first 32 md5 bits mod 10 (the same portable slice the MinHash
    * family uses): 0-7 train, 8 val, 9 test. Map-only, no shuffle.
    */
  def hashSplit(df: DataFrame, idCol: Column): DataFrame = {
    val h = splitBucket(idCol)
    df.select(idCol.as("doc_id"), h.as("bucket"), splitOf(idCol).as("split"))
  }

  /** The [[hashSplit]] bucket / label as bare columns (shared with the
    * fused curation pass — same single-definition rule as
    * [[qualityScore]]).
    */
  def splitBucket(idCol: Column): Column =
    (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % 10).cast("int")

  def splitOf(idCol: Column): Column = {
    val h = splitBucket(idCol)
    when(h <= 7, "train").when(h === 8, "val").otherwise("test")
  }

  /** Within-document repetition ratio — the Gopher-style quality signal
    * (fraction of duplicated word bigrams) that catches boilerplate and
    * degenerate generations: `1 - distinct_bigrams / total_bigrams`.
    * Shingling is the codegen [[graft.functions.WordShingles]]
    * expression; the whole operator is a map-only projection — no
    * shuffle at any corpus size. Docs with fewer than 2 words score 0.
    */
  def repetitionRatio(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val bigrams = graft.functions.TextFunctions.wordShingles(text, 2)
    val total = size(bigrams)
    val distinct = size(array_distinct(bigrams))
    df.select(
      idCol.as("doc_id"),
      total.as("n_bigrams"),
      distinct.as("n_distinct"),
      when(total > 0,
        round((total - distinct).cast("double") / total, 3))
        .otherwise(lit(0.0)).as("repetition_ratio"))
  }

  // PII patterns kept to the regex subset with identical semantics in
  // Java regex and RE2 (the oracle engine): no lookarounds, no
  // backreferences.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val PhonePat = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII detection + scrubbing — the redaction pass every training-data
    * pipeline runs before release: per-doc match counts for email /
    * IPv4 / phone-shaped tokens and the text with each replaced by a
    * typed placeholder. Pure regexp column expressions, map-only.
    */
  def piiScrub(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      PhonePat, "<PHONE>")
    df.select(
      idCol.as("doc_id"),
      size(regexp_extract_all(text, lit(EmailPat), lit(0))).as("n_email"),
      size(regexp_extract_all(text, lit(Ipv4Pat), lit(0))).as("n_ip"),
      size(regexp_extract_all(text, lit(PhonePat), lit(0))).as("n_phone"),
      scrubbed.as("scrubbed"))
  }

  /** Benchmark-contamination check — the GPT-3 appendix-C / Pile-style
    * decontamination pass: a corpus document is contaminated when it
    * shares any word 13-gram with the evaluation/benchmark set. Returns
    * (doc_id, n_overlap) for contaminated docs only. Benchmark suites
    * are fixed-size while the corpus is the 100 TB side, so the
    * benchmark n-gram set is the BROADCAST side of the join — the
    * corpus n-gram stream never shuffles; per-doc overlap counting
    * aggregates on doc_id only.
    */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: Column,
                    text: Column, n: Int = 13): DataFrame = {
    val benchGrams = bench
      .select(explode(graft.functions.TextFunctions.wordShingles(text, n))
        .as("ngram")).distinct()
    corpus
      .select(idCol.as("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(text, n))
          .as("ngram")).distinct()
      .join(broadcast(benchGrams), "ngram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Bloom-filter decontamination — the 100 TB shape of
    * [[contamination]]: the benchmark side folds into a k-probe Bloom
    * bitset (`mBits` bits; built once and held as driver model state
    * like the k-means centroids — benchmark suites are KB–MB scale by
    * definition), and the corpus side is MAP-ONLY — each document's
    * distinct n-grams test k md5-derived bits in the literal bitmask.
    * No corpus-side explode, no distinct shuffle, no join: the pass
    * composes into the single corpus scan. The false-positive rate is
    * the tunable price (≈(1-e^{-kn/m})^k); determinism is total — both
    * engines replay the same md5 bit math, so even false positives
    * hash-match the oracle.
    */
  def contaminationBloom(corpus: DataFrame, bench: DataFrame, idCol: Column,
                         text: Column, n: Int = 13, mBits: Int = 262144,
                         k: Int = 3): DataFrame = {
    require(mBits % 64 == 0 && k >= 1)
    def bitOf(g: Column, j: Int): Column =
      conv(substring(md5(concat(g, lit("#" + j))), 1, 8), 16, 10)
        .cast("long") % mBits
    // build (small side): distinct benchmark grams → set bit positions
    val benchGrams = bench
      .select(explode(graft.functions.TextFunctions.wordShingles(text, n))
        .as("g")).distinct()
    val positions = benchGrams
      .select(explode(array((1 to k).map(j => bitOf(col("g"), j)): _*))
        .as("bit")).distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words(p.toInt / 64) |= 1L << (p.toInt % 64))
    val wordsLit = typedLit(words.toSeq)
    // probe (100 TB side): pure projection
    val grams = array_distinct(
      graft.functions.TextFunctions.wordShingles(text, n))
    val hit = (g: Column) => (1 to k).map { j =>
      val bit = bitOf(g, j)
      val word = element_at(wordsLit, shiftright(bit, 6).cast("int") + 1)
      shiftRightDyn(word, (bit % 64).cast("int")).bitwiseAND(1) === 1
    }.reduce(_ && _)
    corpus.select(
      idCol.as("doc_id"),
      size(grams).cast("long").as("n_grams"),
      size(filter(grams, hit)).cast("long").as("n_flagged"))
      .withColumn("contaminated", (col("n_flagged") > 0).cast("int"))
  }

  /** Catalyst ShiftRight with a column shift amount (the functions API
    * only exposes literal shifts).
    */
  private def shiftRightDyn(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.shim
    shim.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      shim.expression(a), shim.expression(b)))
  }

  /** Corpus-duplicated n-gram fraction — the Gopher repetition-rule
    * twin measured ACROSS documents: per doc, the fraction of its
    * distinct word n-grams that appear in at least one other document
    * (boilerplate/template signal). Two keyed aggregates plus one
    * equi-join on the n-gram; docs shorter than n tokens report 0.
    */
  def dupNgramFraction(df: DataFrame, idCol: Column, text: Column,
                       n: Int = 13): DataFrame = {
    // gram identity = 64-bit hash, taken in the SCAN stage: an 80-byte
    // 13-gram string shrinks to 8 bytes before the distinct/count/join
    // shuffles — gram text never crosses the network (the standard
    // hashed-n-gram form of this gate; collisions at 2^-64 are far
    // below the dup-detection noise floor)
    val g = df.select(idCol.as("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(text, n))
        .as("ngram"))
      .select(col("doc_id"), xxhash64(col("ngram")).as("__gh"))
      .distinct()
    val counts = g.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__nd"))
    val perDoc = g.join(counts, "__gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup"))
    df.select(idCol.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(round(col("n_dup").cast("double") / col("n_grams"), 3),
          lit(0.0)).as("dup_frac"))
  }

  /** Hashed bag-of-tokens linear scorer — the fasttext-shaped quality
    * classifier pass: each token hashes into a weight (here a
    * deterministic pseudo-weight from the same portable md5 slice the
    * split/minhash family uses; a trained model would broadcast a
    * weight table keyed by the same bucket), the document score is the
    * EXACT integer weight sum folded over the token array, and the
    * keep/drop label thresholds it. `aggregate` over the split array
    * makes the whole operator one map-only projection — no explode, no
    * shuffle, which is what lets classifier filtering run in the same
    * stage as the scan at 100 TB.
    */
  def classifierScore(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val toks = split(text, " ")
    val sumW = aggregate(toks, lit(0L), (acc, t) =>
      acc + (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 1001L
        - 500L))
    df.select(idCol.as("doc_id"), size(toks).cast("long").as("n_tokens"),
      sumW.as("score_sum"),
      when(sumW > 0, "keep").otherwise("drop").as("label"))
  }

  /** DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    * arXiv:2302.03169): score every raw-corpus document by how much its
    * hashed-bigram distribution looks like the TARGET distribution vs
    * the RAW distribution. Both distributions are bucketed bigram
    * counts — `buckets` longs each — computed by one aggregate apiece
    * and then carried as LITERAL arrays (model state, the same pattern
    * as the k-means centroids and quantization ranges), so the scoring
    * pass over the 100 TB corpus is MAP-ONLY: fold the document's
    * bigram array against the two broadcast count tables, no explode,
    * no shuffle, no join.
    *
    * Determinism: the classic DSIR weight is Σ log(p_target/p_raw); a
    * float log-sum hash-compares across engines only with rounding
    * luck, so the scores stay EXACT integers — per-doc Σ count_target
    * and Σ count_raw — and the keep label cross-multiplies against the
    * corpus totals (score_t·R > score_r·T ⟺ mean target-mass ratio
    * exceeds the raw-mass ratio), computed in decimal so it cannot
    * overflow.
    */
  def dsirWeights(corpus: DataFrame, target: DataFrame, idCol: Column,
                  text: Column, buckets: Int = 4096): DataFrame = {
    def bucketCounts(df: DataFrame): Array[Long] = {
      val rows = df.select(explode(
          graft.functions.TextFunctions.wordShingles(text, 2)).as("g"))
        .select((conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
        .groupBy("b").count().collect()
      val arr = Array.fill(buckets)(0L)
      rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val tCounts = bucketCounts(target)
    val rCounts = bucketCounts(corpus)
    val tTotal = tCounts.sum
    val rTotal = rCounts.sum
    val tLit = typedLit(tCounts)
    val rLit = typedLit(rCounts)
    def bucketOf(g: Column): Column =
      (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets)
        .cast("int") + 1
    val grams = graft.functions.TextFunctions.wordShingles(text, 2)
    val scoreT = aggregate(grams, lit(0L),
      (acc, g) => acc + element_at(tLit, bucketOf(g)))
    val scoreR = aggregate(grams, lit(0L),
      (acc, g) => acc + element_at(rLit, bucketOf(g)))
    corpus.select(idCol.as("doc_id"),
      size(grams).cast("long").as("n_grams"),
      scoreT.as("score_t"), scoreR.as("score_r"))
      .withColumn("label",
        when(col("score_t").cast("decimal(38,0)") * lit(rTotal) >
             col("score_r").cast("decimal(38,0)") * lit(tTotal), "keep")
          .otherwise("drop"))
  }

  /** Trained hashed naive-Bayes text classifier — the fastText-shaped
    * supervised gate (Joulin et al. 2017 reduced to a count model):
    * TRAIN derives per-class hashed-unigram count tables (`buckets`
    * longs per class — ONE aggregate, bounded model state like the DSIR
    * tables) and collapses them into per-bucket POSTERIOR credits
    * `P(pos | token)` in exact fixed point:
    * `(1e6·(cp+1)·(tn+B)) DIV ((cp+1)·(tn+B) + (cn+1)·(tp+B))` — the
    * add-one-smoothed Bayes posterior with the class-mass normalization
    * built in (a raw per-class likelihood sum systematically favors the
    * bigger class; the posterior ratio cancels it), computed in BigInt
    * so 100 TB token counts cannot overflow. SCORE is map-only: each
    * document folds its token array against the ONE literal credit
    * array; prediction = average posterior (incl. the prior as one
    * vote) above ½, by exact integer cross-multiplication — no float
    * ever enters the hash. Unlike [[dsirWeights]] (corpus-vs-target
    * importance reweighting), this is a supervised per-class model
    * trained on in-corpus labels.
    *
    * Scale shape: train = one shuffle at bucket cardinality (≤ B rows);
    * score = zero shuffles — the corpus streams through a projection.
    */
  def nbClassifier(df: DataFrame, idCol: Column, text: Column,
                   isPos: Column, posName: String = "pos",
                   negName: String = "neg",
                   buckets: Int = 1024): DataFrame = {
    val (post, prior) = nbTrain(df, text, isPos, buckets)
    nbApply(df, idCol, text, post, prior, posName, negName)
  }

  /** Apply a trained [[nbClassifier]] model (the posterior credit array
    * + prior — bounded literal model state) to any batch OR streaming
    * DataFrame: the scoring fold is a pure projection, so the same
    * model gates a 100 TB batch curation pass and a live document
    * stream (train offline, score in-flight — the lambda-architecture
    * split every production quality filter runs).
    */
  def nbApply(df: DataFrame, idCol: Column, text: Column,
              post: Array[Long], prior: Long,
              posName: String = "pos", negName: String = "neg"): DataFrame = {
    val buckets = post.length
    def bucketOf(t: Column): Column =
      (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets)
    val words = split(text, " ")
    val score = aggregate(words, lit(prior),
      (acc, t) => acc + element_at(typedLit(post), bucketOf(t).cast("int") + 1))
    df.select(idCol.as("doc_id"), size(words).cast("long").as("n_tokens"),
      score.as("score_pos"))
      // separate projection so the fold evaluates once, not re-inlined
      .withColumn("score_neg",
        lit(1000000L) * (col("n_tokens") + 1L) - col("score_pos"))
      .withColumn("pred",
        when(col("score_pos") > col("score_neg"), posName).otherwise(negName))
  }

  /** The trained model of [[nbClassifier]] as carryable state:
    * (posterior credit array, prior credit). */
  def nbTrain(df: DataFrame, text: Column, isPos: Column,
              buckets: Int = 1024): (Array[Long], Long) = {
    def bucketOf(t: Column): Column =
      (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets)
    val counts = df.select(isPos.as("__p"),
        explode(split(text, " ")).as("tok"))
      .groupBy(bucketOf(col("tok")).as("b"))
      .agg(sum(when(col("__p"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("__p"), 0L).otherwise(1L)).as("cn"))
      .collect()
    val cPos = Array.fill(buckets)(0L)
    val cNeg = Array.fill(buckets)(0L)
    counts.foreach { r =>
      cPos(r.getLong(0).toInt) = r.getLong(1)
      cNeg(r.getLong(0).toInt) = r.getLong(2)
    }
    val tPos = BigInt(cPos.sum) + buckets
    val tNeg = BigInt(cNeg.sum) + buckets
    val post = Array.tabulate(buckets) { b =>
      val np = (BigInt(cPos(b)) + 1) * tNeg
      val nn = (BigInt(cNeg(b)) + 1) * tPos
      (BigInt(1000000) * np / (np + nn)).toLong
    }
    val r = df.agg(count(lit(1)), sum(when(isPos, 1L).otherwise(0L)))
      .collect()(0)
    (post, (1000000L * (r.getLong(1) + 1)) / (r.getLong(0) + 2))
  }

  /** C4/RefinedWeb-style per-domain quota: keep at most `cap` documents
    * per domain, chosen by a deterministic hash priority (md5 of the
    * doc id — a stable "random" order any engine replays). Emits only
    * the kept rows with their rank, so Catalyst's InferWindowGroupLimit
    * turns the window into a partial+final WindowGroupLimit: every map
    * task keeps at most `cap` rows per domain in a bounded heap BEFORE
    * the shuffle — a hot domain (the classic blogspot.com skew) never
    * concentrates more than cap·partitions rows on one reducer.
    */
  def domainQuota(df: DataFrame, idCol: Column, domainCol: Column,
                  cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    df.select(idCol.as("doc_id"), domainCol.as("domain"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
  }

  /** Token-budget data mixing: give every group (language, domain,
    * source…) the same token budget and fill it in deterministic
    * hash-priority order — the doc that tips the running token total
    * over the budget is the first one dropped. One shuffle (the window
    * partition on the group key); all arithmetic is exact integers.
    * Emits every doc with its running total and keep flag so the caller
    * can audit what the budget excluded (no silent truncation).
    */
  def tokenBudgetMix(df: DataFrame, idCol: Column, groupCol: Column,
                     text: Column, budgetPerGroup: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    df.select(idCol.as("doc_id"), groupCol.as("grp"),
      size(split(text, " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("kept",
        when(col("cum_tokens") <= budgetPerGroup, 1).otherwise(0))
  }

  /** HTML→text extraction (the trafilatura-shaped step between a WARC
    * response record and curation — FineWeb runs exactly this shape):
    * drop `<head>` wholesale, strip `<script>`/`<style>` blocks and
    * comments, strip remaining tags to spaces, THEN decode entities
    * (order matters: decoding first would turn `&lt;b&gt;` into a tag
    * the stripper eats — user text must survive), collapse whitespace,
    * trim. Map-only: four regexp passes plus the codegen
    * [[graft.functions.HtmlUnescape]] scanner, composing into the
    * single corpus scan at any scale.
    */
  def htmlExtract(df: DataFrame, idCol: Column, html: Column): DataFrame = {
    val noHead = regexp_replace(html, "(?is)<head[^>]*>.*?</head>", " ")
    val noBlocks = regexp_replace(noHead,
      "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    val decoded = graft.functions.TextFunctions.htmlUnescape(noTags)
    val extracted = trim(regexp_replace(decoded, "\\s+", " "))
    df.select(
      idCol.as("doc_id"),
      extracted.as("extracted"),
      length(html).as("n_chars_html"),
      length(extracted).as("n_chars_extracted"))
  }

  /** URL provenance gate (the C4/RefinedWeb UT1-blocklist pass): parse
    * scheme/host/path out of each document's URL, derive the
    * registrable domain (last two host labels — a production run plugs
    * a public-suffix list in the same shape), and drop documents whose
    * registrable domain OR exact host is blocklisted. Emits every doc
    * with its parsed fields, keep flag, and the reason — provenance
    * filtering must be auditable, not silent.
    *
    * Scale shape: the blocklist (MB-scale even for UT1's millions of
    * entries) broadcasts; the corpus side is a map-only parse plus two
    * broadcast left joins — no shuffle of the 100 TB side.
    */
  def urlFilter(df: DataFrame, idCol: Column, urlCol: Column,
                blocklist: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blDomain = broadcast(blocklist.toDF("bl_domain"))
    val blHost = broadcast(blocklist.toDF("bl_host"))
    val host = regexp_extract(urlCol, "^[a-z]+://([^/]+)", 1)
    val parsed = df.select(
      idCol.as("doc_id"),
      regexp_extract(urlCol, "^([a-z]+)://", 1).as("scheme"),
      host.as("host"),
      concat_ws(".", slice(split(host, "\\."), -2, 2)).as("domain"),
      regexp_extract(urlCol, "^[a-z]+://[^/]+(/.*)?$", 1).as("path"))
    parsed
      .join(blDomain, parsed("domain") === blDomain("bl_domain"), "left")
      .join(blHost, parsed("host") === blHost("bl_host"), "left")
      .withColumn("reason",
        when(col("bl_domain").isNotNull, "domain")
          .when(col("bl_host").isNotNull, "host")
          .otherwise("ok"))
      .withColumn("kept", (col("reason") === "ok").cast("int"))
      .drop("bl_domain", "bl_host")
  }

  /** GPT-style training-sequence packing (concat-and-chunk): shard the
    * corpus by document hash, concatenate each shard's token stream in
    * deterministic hash-priority order, and chunk it into fixed
    * `seqLen`-token sequences. Emits, per document, the half-open token
    * interval it occupies in its shard's stream and the first/last
    * sequence it lands in — a doc may straddle a boundary, and which
    * docs were split where is exactly the audit a packing run needs.
    *
    * Scale shape: shards are independent, so packing never needs a
    * global sort — one shuffle (the per-shard window), and a 100 TB
    * corpus packs in `nShards`-way parallel. Sequence ids are
    * shard-local; `shard * 2^40 + first_seq` makes them globally unique
    * when a flat id is needed. All arithmetic is exact integer div/mod.
    */
  def packSequences(df: DataFrame, idCol: Column, text: Column,
                    seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    df.select(idCol.as("doc_id"),
        size(split(text, " ")).cast("long").as("n_tokens"))
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % nShards).cast("int"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_begin", col("tok_end") - col("n_tokens"))
      .withColumn("first_seq", expr(s"tok_begin div $seqLen"))
      .withColumn("last_seq", expr(s"(tok_end - 1) div $seqLen"))
      .withColumn("seq_offset", pmod(col("tok_begin"), lit(seqLen.toLong)))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, arXiv:1910.10683
    * §2.2): keep only lines that end in a terminal punctuation mark AND
    * carry at least three words AND do not mention javascript; then
    * drop the whole document when the cleaned text has fewer than five
    * sentences, mentions "lorem ipsum", or contains a curly brace.
    * Emits per-doc line counts, the cleaned text, and the keep label —
    * everything an audit of the filter needs. Map-only: the line rules
    * are a `filter` fold over `split(text, '\n')`, no explode, no
    * shuffle, so the pass composes with the other curation stages in
    * one scan of the 100 TB corpus.
    */
  def c4LineClean(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val lines = split(text, "\n")
    val keepLine = (l: Column) =>
      l.rlike("[.!?\"]$") && size(split(l, " ")) >= 3 &&
        !lower(l).contains("javascript")
    val kept = filter(lines, keepLine)
    val cleaned = array_join(kept, "\n")
    val nSentences = size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0)))
    val lowerAll = lower(text)
    df.select(
      idCol.as("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      cleaned.as("cleaned"),
      nSentences.as("n_sentences"),
      when(nSentences >= 5 && !lowerAll.contains("lorem ipsum") &&
           !lowerAll.contains("{"), "keep").otherwise("drop").as("label"))
  }

  /** Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446
    * A1.1): word count in [50, 100000], mean word length in [3, 10],
    * symbol-to-word ratio (# and ellipsis) at most 0.1, at least 80% of
    * words containing an alphabetic character, and at least two
    * distinct stop words present. Every ratio test cross-multiplies
    * exact integer counts (3n ≤ Σlen ≤ 10n, 10·sym ≤ n, 5·alpha ≥ 4n),
    * so the verdict hash-replays on any engine — no float thresholds.
    * Map-only: one projection folding over the word array.
    */
  def gopherRules(df: DataFrame, idCol: Column, text: Column,
                  stops: Seq[String] =
                    Seq("the", "be", "to", "of", "and", "that", "have",
                        "with")): DataFrame =
    df.select(idCol.as("doc_id") +: gopherCols(text, stops): _*)

  /** [[gopherRules]] as an appending transform: the same rule columns
    * added to the input rows — for pipeline composition (extract →
    * gate → dedup) without the self-join a project-then-rejoin shape
    * would cost on the 100 TB side.
    */
  def gopherLabel(df: DataFrame, text: Column,
                  stops: Seq[String]): DataFrame =
    df.withColumns(scala.collection.immutable.ListMap(
      Seq("n_words", "sum_word_len", "n_alpha_words", "n_symbols",
        "n_stop_kinds", "label").zip(gopherCols(text, stops)): _*))

  private def gopherCols(text: Column, stops: Seq[String]): Seq[Column] = {
    val words = split(text, " ")
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val nSym = (size(regexp_extract_all(text, lit("#"), lit(0))) +
      size(regexp_extract_all(text, lit("\\.\\.\\.|…"), lit(0)))).cast("long")
    val nStop = size(filter(typedLit(stops),
      s => array_contains(words, s))).cast("long")
    Seq(
      nWords.as("n_words"),
      sumLen.as("sum_word_len"),
      nAlpha.as("n_alpha_words"),
      nSym.as("n_symbols"),
      nStop.as("n_stop_kinds"),
      when(nWords >= 50 && nWords <= 100000 &&
           sumLen >= nWords * 3 && sumLen <= nWords * 10 &&
           nSym * 10 <= nWords &&
           nAlpha * 5 >= nWords * 4 &&
           nStop >= 2, "keep").otherwise("drop").as("label"))
  }

  /** ftfy-style Unicode cleanup (the fix-text pass every crawled corpus
    * runs before dedup/tokenization): NFC normalization via the
    * ASCII-fast-pathed [[graft.functions.NfcNormalize]] expression, then
    * strip C0/C1-ish control characters (keeping `\t` and `\n`), map
    * the fixed-width Unicode spaces (NBSP, figure space, narrow NBSP)
    * to ASCII space, collapse space runs, and trim. Emits the cleaned
    * text plus audit counts (raw/clean code-point lengths, an NFC-change
    * flag, a control-char flag).
    *
    * Map-only — composes into the single 100 TB corpus scan; the NFC
    * cost lands only on the non-ASCII minority of documents.
    */
  def unicodeClean(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val nfc = graft.functions.TextFunctions.nfcNormalize(text)
    val ctl = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"
    val noCtl = regexp_replace(nfc, ctl, "")
    val spaced = regexp_replace(noCtl, "[\\x{A0}\\x{2007}\\x{202F}]", " ")
    val cleaned = trim(regexp_replace(spaced, " {2,}", " "))
    df.select(
      idCol.as("doc_id"),
      cleaned.as("cleaned"),
      length(text).as("n_chars_raw"),
      length(cleaned).as("n_chars_clean"),
      (nfc =!= text).cast("int").as("changed_nfc"),
      text.rlike(ctl).cast("int").as("had_control"))
  }

  /** Document fingerprint: position-weighted rolling hash over tokens.
    * Token hash = two md5 hex chars (portable, exact int64 math); weight
    * cycles with position so near-identical docs with swapped words get
    * different prints.
    */
  def fingerprint(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), posexplode(split(text, " ")).as(Seq("pos", "tok")))
    val tokHash = (ascii(substring(md5(col("tok")), 1, 1)) * 256 +
      ascii(substring(md5(col("tok")), 2, 1))).cast("long")
    toks.groupBy(col("doc_id"))
      .agg((sum(tokHash * (lit(1L) + col("pos") % 97)) % 1000000007L).as("fingerprint"))
  }

  /** CCNet-style n-gram language-model quality scoring (Wenzek et al.
    * 2020 filter corpora by LM perplexity; here the LM is trained on the
    * corpus itself in the same job). Bigram LM with add-one smoothing,
    * kept in EXACT fixed-point integers so the score is reproducible
    * across engines and re-runs: per-bigram credit =
    * `(1e6 * (c(w1 w2) + 1)) div (c(w1) + |V|)`, document score = sum.
    *
    * Scale shape: the LM (unigram + bigram count tables) is CORPUS-sized
    * and therefore never broadcast — both scoring joins are gram-keyed
    * shuffle equi-joins, counts get map-side combine, and only the
    * single-row vocabulary size crosses the driver as a broadcast. Every
    * stage is a HashAggregate or equi-join; nothing is quadratic and no
    * executor holds more than its hash-partition of the LM.
    */
  def lmScore(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val docs = df.select(idCol.as("doc_id"), text.as("text"))
    // token/bigram identity = 64-bit hashes taken in the scan stage —
    // the LM is corpus-sized so its count tables MUST shuffle, but
    // nothing says the shuffled keys have to be strings
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val uni = toks.select(xxhash64(col("tok")).as("__th"))
      .groupBy(col("__th")).agg(count(lit(1)).as("c_uni"))
    val vocab = uni.agg(count(lit(1)).as("vsz"))
    val bi = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 2))
          .as("bigram"))
      .select(col("doc_id"), xxhash64(col("bigram")).as("__bh"),
        xxhash64(substring_index(col("bigram"), " ", 1)).as("__ph"))
    // the credit (1e6·(c_bi+1)) div (c_uni+V) is constant per DISTINCT
    // bigram — join the count tables at vocabulary cardinality and hit
    // the instance stream ONCE with the finished credit, instead of
    // dragging every bigram instance through two joins
    val biCnt = bi.groupBy(col("__bh"))
      .agg(count(lit(1)).as("c_bi"), first(col("__ph")).as("__ph"))
    val biScore = biCnt
      .join(uni, biCnt("__ph") === uni("__th"))
      .crossJoin(broadcast(vocab))
      .select(col("__bh"),
        expr("(1000000L * (c_bi + 1)) DIV (c_uni + vsz)").as("s"))
    val scored = bi.select(col("doc_id"), col("__bh")).join(biScore, "__bh")
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_bigrams"),
        coalesce(sum(col("s")), lit(0L)).as("lm_score"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    * corpus into head / middle / tail thirds by language-model score —
    * the standard "keep the head, maybe the middle, drop the tail"
    * curation gate. The per-document signal is [[lmScore]]'s exact
    * integer bigram credit averaged per bigram (`lm_score DIV
    * n_bigrams` — higher = more fluent), so bucketing is deterministic
    * across engines with no float percentile.
    *
    * Scale shape: thresholds come from a VALUE HISTOGRAM, not a global
    * sort — the avg credit lives in [0, 1e6], so the histogram is a
    * bounded aggregate (≤1e6+1 rows at ANY corpus size); one window
    * pass over that tiny table finds the value at desc-rank ⌈n/3⌉ and
    * ⌈2n/3⌉, and the thresholds broadcast back onto a map-only label.
    * Boundary ties share a value so they share a bucket (all go to the
    * better bucket) — thirds are exact up to value ties, the same
    * contract CCNet's own histogram cutoffs have.
    */
  def perplexityBuckets(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    // three consumers (histogram, total, final label) share the LM
    // scoring subtree; without a persist each would recompute the full
    // four-shuffle lmScore DAG — cache the (doc_id, counts) result,
    // which is doc-count-sized, never token-sized
    val scored = lmScore(df, idCol, text)
      .withColumn("avg_credit",
        when(col("n_bigrams") > 0, expr("lm_score DIV n_bigrams"))
          .otherwise(lit(0L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded() localCheckpoints the histogram (replacing the old
    // never-unpersisted cache) and enforces the bounded-domain
    // precondition of the global cumulative window below
    val hist = graft.ops.BoundedGlobal.bounded(
      scored.groupBy(col("avg_credit").as("v"))
        .agg(count(lit(1)).as("c")),
      "perplexityBuckets credit histogram")
    // doc total = Σ histogram counts — derived from the tiny hist, not a
    // third pass over the scored subtree
    val tot = hist.agg(sum(col("c")).as("n"))
    val w = graft.ops.BoundedGlobal.cumFrameAnchored(col("v"), col("v").desc)
    val th = hist.withColumn("ge", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .agg(
        max(when(col("ge") >= expr("(n + 2) DIV 3"), col("v"))).as("h"),
        max(when(col("ge") >= expr("(2 * n + 2) DIV 3"), col("v"))).as("m"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_bigrams"), col("avg_credit"),
        when(col("avg_credit") >= col("h"), "head")
          .when(col("avg_credit") >= col("m"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** BPE merge induction (Sennrich et al. 2016) — learn the first k
    * tokenizer merges from the corpus. Runs on the WORD-COUNT HISTOGRAM,
    * not the raw token stream: one corpus-scale aggregate builds the
    * vocabulary (word, count), and every merge iteration then touches
    * only that (much smaller) table — the standard trick that makes BPE
    * training feasible at 100 TB. Per iteration: adjacent symbol pairs
    * via the codegen [[graft.functions.WordShingles]] expression,
    * count-weighted HashAggregate, total-ordered argmax (count desc,
    * pair asc — deterministic ties), then a map-only space-delimited
    * `replace` applies the merge with BPE's leftmost-non-overlapping
    * greedy semantics. Only the k winning pairs cross the driver (model
    * state, MLlib-shaped like the k-means trainer).
    *
    * Training is restricted to `^[a-z]+$` words (BPE pre-tokenization
    * splits off digits/punctuation anyway), which also keeps character
    * splitting byte-exact across engines.
    */
  def bpeTrain(df: DataFrame, text: Column, merges: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel
    val vocab = df.select(explode(split(text, " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(concat_ws(" ", split(col("word"), "")).as("seg"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var seg = vocab
      val out = Seq.newBuilder[(Int, String, String, Long)]
      for (step <- 1 to merges) {
        val top = seg
          .select(explode(graft.functions.TextFunctions
            .wordShingles(col("seg"), 2)).as("pair"), col("cnt"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("pair"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val pair = top(0).getString(0)
          val c = top(0).getLong(1)
          val merged = pair.replace(" ", "")
          out += ((step, pair, merged, c))
          // space padding makes every symbol boundary explicit, so a
          // plain (leftmost, non-overlapping) replace IS the BPE merge
          seg = seg.select(
            trim(expr(s"replace(concat(' ', seg, ' '), ' $pair ', ' $merged ')"))
              .as("seg"), col("cnt"))
        }
      }
      import spark.implicits._
      out.result().toDF("step", "pair", "merged", "cnt")
    } finally vocab.unpersist()
  }

  /** Apply learned BPE merges — the tokenizer's ENCODE side, pairing
    * [[bpeTrain]]: each `^[a-z]+$` word splits to characters and the k
    * merge rules apply IN TRAINING ORDER (space-padded leftmost
    * non-overlapping replace, the exact operation training used on the
    * vocabulary — train and apply replay the same algebra). Per
    * document: word count, raw char count, and post-merge symbol count
    * (the "tokens this document costs" number a data pipeline budgets
    * with).
    *
    * Scale shape: the merge table is driver-held model state (k rows);
    * the application is ONE map-only projection folding over the word
    * array — no explode, no shuffle, composable with the corpus scan.
    */
  def bpeApply(df: DataFrame, idCol: Column, text: Column,
               merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(text, " "), w => w.rlike("^[a-z]+$"))
    def encode(w: Column): Column =
      merges.foldLeft(concat_ws(" ", split(w, ""))) { case (seg, (p, m)) =>
        trim(org.apache.spark.sql.functions.replace(
          concat(lit(" "), seg, lit(" ")), lit(s" $p "), lit(s" $m ")))
      }
    df.select(idCol.as("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L), (acc, w) =>
        acc + length(w).cast("long")).as("n_chars"),
      aggregate(words, lit(0L), (acc, w) =>
        acc + size(split(encode(w), " ")).cast("long")).as("n_symbols"))
  }

  /** TF-IDF keyword extraction — the classic per-document topic signal
    * (used in curation for domain tagging and near-topic grouping).
    * IDF stays in exact fixed point (`(1e6·N) DIV df` — the repo's
    * integer-credit rule; the log shaping of textbook IDF changes
    * ranking only where df ratios are extreme, and a float log would
    * leave the hash), score = tf · idf, top-`k` terms per document via
    * the partial+final WindowGroupLimit (bounded map-side heap per
    * doc). Shuffle shape: token text crosses the network exactly once
    * (the tf aggregate); document frequency aggregates the tf table at
    * vocabulary cardinality; N broadcasts as a one-row aggregate.
    */
  def tfidfKeywords(df: DataFrame, idCol: Column, text: Column,
                    k: Int = 3): DataFrame = {
    val tf = df.select(idCol.as("doc_id"),
        explode(split(text, " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"),
        (col("tf") * expr("(1000000L * __n) DIV __df")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Stratified downsampling to a per-stratum document target — the
    * "don't let the head language drown the tail" mixing gate every
    * multilingual pipeline runs. Deterministic: a document is kept iff
    * `hash_bucket(doc_id) * n_stratum < target * buckets`, i.e. an exact
    * integer Bernoulli(target/n) draw on the stable id hash — the sample
    * survives reshuffles, retries and corpus growth, unlike
    * `df.sample()`. Plan: one tiny per-stratum count aggregate broadcast
    * back onto a map-only filter — the corpus itself never shuffles.
    */
  def stratifiedSample(df: DataFrame, idCol: Column, stratumCol: Column,
                       target: Long = 100L): DataFrame = {
    val counts = df.groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("cnt"))
    val bucket = conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % 10000L
    df.join(broadcast(counts), stratumCol === col("stratum"))
      .where(bucket * col("cnt") < lit(target) * 10000L)
      .select(idCol.as("doc_id"), stratumCol.as("lang"))
  }

  /** Temperature-flattened domain mixture (the UniMax / mT5 α=0.5
    * resampling gate): re-weight a skewed domain distribution toward
    * uniform by keeping each domain's documents with probability
    * ∝ √n_d / n_d — head domains are damped, tail domains survive. All
    * arithmetic stays integer-exact and replayable: the per-domain
    * weight is `s_d = ⌊√n_d⌋` (IEEE sqrt is correctly rounded, floor of
    * it deterministic in any engine), the normalizer is the INTEGER sum
    * Σs (immune to float summation order), and the keep test compares
    * a 20-bit id hash against the precomputed integer threshold
    * `t_d = (budget·2^20·s_d) div (Σs·n_d)` — products bounded well
    * inside BIGINT at any corpus size.
    *
    * Plan: two tiny aggregates (|domains| rows) broadcast back onto a
    * map-only keep filter — the corpus never shuffles, the same shape
    * as [[stratifiedSample]] and the DSIR scorer.
    */
  /** The per-domain integer thresholds alone — bounded model state
    * (|domains| rows). On a STREAM, train these on a batch corpus and
    * apply with [[temperatureApply]]: the keep test is then a pure
    * stream-static broadcast join + filter, no state store at all.
    */
  def temperatureThresholds(df: DataFrame, domainCol: Column): DataFrame = {
    val counts = df.groupBy(domainCol.as("domain"))
      .agg(count(lit(1)).as("n_d"))
      .withColumn("s_d",
        expr("CAST(floor(sqrt(CAST(n_d AS DOUBLE))) AS BIGINT)"))
    val norm = counts.agg(sum(col("s_d")).as("s_sum"),
      sum(col("n_d")).as("n_total"))
    counts.crossJoin(broadcast(norm))
      .withColumn("thr",
        expr(s"((n_total div 4) * ${1L << 20} * s_d) div (s_sum * n_d)"))
      .select(col("domain"), col("n_d"), col("thr"))
  }

  /** Apply trained thresholds to any (possibly streaming) frame. */
  def temperatureApply(df: DataFrame, idCol: Column, domainCol: Column,
                       thresholds: DataFrame): DataFrame = {
    val h = conv(substring(md5(idCol.cast("string")), 1, 5), 16, 10)
      .cast("long")
    df.select(idCol.as("doc_id"), domainCol.as("domain"))
      .join(broadcast(thresholds), "domain")
      .select(col("doc_id"), col("domain"), col("n_d"), col("thr"),
        (h < col("thr")).as("kept"))
  }

  def temperatureMix(df: DataFrame, idCol: Column,
                     domainCol: Column): DataFrame =
    temperatureApply(df, idCol, domainCol,
      temperatureThresholds(df, domainCol))

  /** Epoch-repeat mixture — the UP-sampling third of the mix family
    * (budget truncates, temperature subsamples, epochs REPEAT): given a
    * total budget of `epochsMilli`/1000 effective epochs, domain d's
    * per-document repeat rate is r_d = budget·s_d/(Σs·n_d) with the
    * same √n_d flattening weights as [[temperatureThresholds]] — small
    * domains repeat (the Pile/LLaMA multi-epoch treatment of Wikipedia
    * and books), head domains dilute below 1. Each document gets
    * ⌊r_d⌋ copies plus one more iff its 20-bit id hash falls under the
    * fractional remainder — stochastic rounding that lands the realized
    * domain total on n_d·r_d in expectation, deterministically
    * replayable by any engine.
    *
    * Arithmetic: r is carried in milli-copies; the rate numerator
    * `epochsMilli·n_total·s_d` is computed in DECIMAL(38,0) — at
    * 100 TB scale (n_total ~1e12, s_d ~1e6) the product overflows
    * BIGINT, the lesson of the PageRank hub-sum fix. The quotient is
    * back in safe BIGINT range (≤ epochsMilli·n_total/n_d).
    *
    * Plan: same shape as [[temperatureMix]] — one |domains|-row
    * aggregate pair broadcast onto a map-only pass; the corpus never
    * shuffles. The output row per INPUT doc carries n_copies rather
    * than exploding — downstream packing explodes where needed, and
    * the verdict stays joinable/auditable.
    */
  def epochRates(df: DataFrame, domainCol: Column,
                 epochsMilli: Long = 2000L): DataFrame = {
    val counts = df.groupBy(domainCol.as("domain"))
      .agg(count(lit(1)).as("n_d"))
      .withColumn("s_d",
        expr("CAST(floor(sqrt(CAST(n_d AS DOUBLE))) AS BIGINT)"))
    val norm = counts.agg(sum(col("s_d")).as("s_sum"),
      sum(col("n_d")).as("n_total"))
    counts.crossJoin(broadcast(norm))
      .withColumn("r_milli",
        expr(s"CAST((CAST($epochsMilli AS DECIMAL(38,0)) * n_total * s_d)" +
          " div (CAST(s_sum AS DECIMAL(38,0)) * n_d) AS BIGINT)"))
      .select(col("domain"), col("n_d"), col("r_milli"))
  }

  /** Apply trained epoch rates — map-only after the broadcast join. */
  def epochApply(df: DataFrame, idCol: Column, domainCol: Column,
                 rates: DataFrame): DataFrame = {
    val h = conv(substring(md5(idCol.cast("string")), 1, 5), 16, 10)
      .cast("long")
    df.select(idCol.as("doc_id"), domainCol.as("domain"))
      .join(broadcast(rates), "domain")
      .select(col("doc_id"), col("domain"), col("n_d"), col("r_milli"),
        (expr("r_milli div 1000") +
          when(h * 1000 < (col("r_milli") % 1000) * (1L << 20), 1L)
            .otherwise(0L)).as("n_copies"))
  }

  def epochMix(df: DataFrame, idCol: Column, domainCol: Column,
               epochsMilli: Long = 2000L): DataFrame =
    epochApply(df, idCol, domainCol,
      epochRates(df, domainCol, epochsMilli))

  /** RAG-style chunking: overlapping token windows of `win` tokens at
    * `stride` (< win ⇒ `win - stride` tokens of overlap), the unit every
    * retrieval/embedding pipeline feeds downstream. Tail chunks are
    * clamped, single short docs yield one chunk. Map-only generate —
    * split, sequence, slice, array_join are all codegen built-ins and no
    * shuffle appears at any corpus size.
    */
  def chunkOverlap(df: DataFrame, idCol: Column, text: Column,
                   win: Int = 64, stride: Int = 48): DataFrame =
    df.select(idCol.as("doc_id"), split(text, " ").as("w"))
      .withColumn("nc",
        when(size(col("w")) <= win, lit(1)).otherwise(
          expr(s"1 + (size(w) - $win + ${stride - 1}) DIV $stride")))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), col("nc").cast("int") - 1))
          .as(Seq("chunk_ix", "_i")))
      .select(col("doc_id"), col("chunk_ix").cast("long").as("chunk_ix"),
        size(slice(col("w"), col("chunk_ix") * stride + 1, lit(win)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("w"), col("chunk_ix") * stride + 1, lit(win)), " ")
          .as("chunk"))

  /** Flesch-Kincaid grade-level readability — the edu-quality signal
    * (FineWeb-Edu-class filters gate on it) — in EXACT integers: the
    * grade `0.39·W/X + 11.8·S/W − 15.59` (W words, X sentences, S
    * syllables) is scaled to centi-grades over the common denominator
    * X·W and OFFSET by +10000 so the dividend stays positive — Spark's
    * `div` truncates toward zero while DuckDB's `//` floors, and the
    * offset makes both the same operation. Syllables are the standard
    * vowel-group proxy (`[aeiouy]+` runs, lowercased); sentences are
    * terminal-punctuation counts clamped to ≥1. Map-only: three regexp
    * counts in one projection, no shuffle at any corpus size.
    */
  def readability(df: DataFrame, idCol: Column, text: Column): DataFrame =
    df.select(idCol.as("doc_id"),
        size(split(text, " ")).cast("long").as("words"),
        greatest(size(regexp_extract_all(text, lit("[.!?]"), lit(0)))
          .cast("long"), lit(1L)).as("sentences"),
        size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("syllables"))
      .withColumn("fk_centi_p10k", expr(
        "(39 * words * words + 1180 * syllables * sentences" +
          " + 8441 * sentences * words) div (sentences * words)"))
      // 8441 = 10000 - 1559: the -15.59 grade constant folded into the
      // positivity offset
      .withColumn("band",
        when(col("fk_centi_p10k") < 10800, "easy")
          .when(col("fk_centi_p10k") < 11300, "standard")
          .otherwise("hard"))

  /** PMI collocation extraction (Church & Hanks 1990): the top-k word
    * bigrams by pointwise mutual information, min-support filtered —
    * the classic multi-word-expression detector ("new york" scores high
    * because c_xy·N ≫ c_x·c_y). The score is the PMI ARGUMENT scaled to
    * ppm, `(1e6·c_xy·N) div (c_x·c_y)`, exact integer floor division —
    * log is monotone, so ranking by the argument IS ranking by PMI and
    * no float ever appears. The numerator runs in DECIMAL(38,0):
    * c_xy·N is a product of two corpus-scale counts and overflows
    * BIGINT at 100 TB (the epochRates/PageRank lesson); the quotient is
    * back in BIGINT range (≤ 1e6·N/minCount) and casts down exactly.
    *
    * Scale: token IDENTITY is the 60-bit md5 prefix
    * ([[graft.functions.ShingleHash]] n=1 — one codegen digest pass per
    * doc), so both counting aggregates shuffle LONGS: unigram counts
    * key on the token hash, bigram counts on the adjacent (h1, h2)
    * pair built by a codegen slice+zip — token TEXT never crosses the
    * network (the string formulation this replaces exploded ~12-byte
    * bigram strings into the aggregate and measured 3.5× DuckDB at
    * sf10, the allocation class killed in heavy-hitters r9 / HLL r8).
    * N derives from the bigram counts, never a second corpus scan;
    * minCount prunes before the two vocab-keyed joins; top-k is
    * TakeOrderedAndProject totally ordered by (score desc, h1, h2).
    * Only the ≤2k WINNER word hashes ever resolve back to text: one
    * map-only pass filters (hash, word) pairs against the broadcast
    * winner set and `min(word)` makes the choice deterministic under
    * (vanishing, 60-bit) hash collisions — the same gram-hash identity
    * contract as `x_text_dupgrams`/`x_split_leakage`. The k-row result
    * returns pre-collected (driver model state, the kmeans/hllSetOps
    * pattern).
    */
  def pmiCollocations(df: DataFrame, text: Column,
                      minCount: Int = 5, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.graftshim.shim
    val spark = df.sparkSession
    def tokH(t: Column): Column =
      shim.column(graft.functions.ShingleHash(shim.expression(t), 1, 15))
    val base = df.select(tokH(text).as("th"))
    val uni = base.select(explode(col("th")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c_w"))
    val m = greatest(size(col("th")) - 1, lit(0))
    val bi = base
      .select(explode(arrays_zip(
        slice(col("th"), lit(1), m).as("h1"),
        slice(col("th"), lit(2), m).as("h2"))).as("p"))
      .select(col("p.h1").as("h1"), col("p.h2").as("h2"))
      .groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("c_xy"))
    val n = bi.agg(sum(col("c_xy")).as("n_bi"))
    val winners = bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("h").as("h1"), col("c_w").as("c_x")), "h1")
      .join(uni.select(col("h").as("h2"), col("c_w").as("c_y")), "h2")
      .crossJoin(broadcast(n))
      .withColumn("pmi_ppm", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * c_xy * n_bi)" +
          " div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"))
      .select(col("h1"), col("h2"), col("c_xy"), col("c_x"), col("c_y"),
        col("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("h1"), col("h2"))
      .limit(k)
      .collect()
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bigram",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("c_xy",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("c_x",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("c_y",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pmi_ppm",
        org.apache.spark.sql.types.LongType, nullable = false)))
    if (winners.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    val wordHs = winners.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .distinct.toSeq
    val wordOf = df
      .select(explode(arrays_zip(
        tokH(text).as("h"),
        graft.functions.TextFunctions.wordShingles(text, 1).as("w")))
        .as("p"))
      .select(col("p.h").as("h"), col("p.w").as("w"))
      .filter(col("h").isin(wordHs: _*))
      .groupBy(col("h")).agg(min(col("w")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(winners.map { r =>
        // a winner hash absent on the resolve pass means the corpus
        // changed between the two actions — fail loudly, not with a
        // bare NoSuchElementException
        def word(h: Long): String = wordOf.getOrElse(h, sys.error(
          s"winner hash $h missing on resolve pass — " +
            "non-deterministic input between actions?"))
        org.apache.spark.sql.Row(
          word(r.getLong(0)) + " " + word(r.getLong(1)),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      }: _*)
    spark.createDataFrame(rows, outSchema)
  }
}
