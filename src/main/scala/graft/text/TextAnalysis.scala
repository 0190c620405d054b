package graft.text

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, fingerprinting, language identification.
  *
  * Everything is declarative `functions._` (codegen'd, no UDFs) and
  * mirrored 1:1 in DuckDB oracle SQL. Ratio outputs are rounded (6 dp)
  * on both sides; all integer outputs are BIGINT on both sides.
  */
object TextAnalysis {

  /** Tokenizer regex for the "BPE-ish" count: letter runs, digit runs,
    * or single non-alphanumeric marks.
    */
  val TokenPattern = "[a-z0-9]+|[^a-z0-9 ]"

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** (doc_id, g): one row per word-level n-gram shingle occurrence.
    * Implemented as a typed flatMap (JIT'd sliding window), not
    * `transform`/`element_at` lambdas: Spark's higher-order functions
    * evaluate interpreted per element, which measured ~30× slower than
    * this loop on the shingling hot path. Docs shorter than n words
    * yield nothing (same as the oracle's generate_series).
    */
  def shingleRows(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        if (w.length < n) Iterator.empty
        else w.iterator.sliding(n).withPartial(false).map(g => (id, g.mkString(" ")))
      }.toDF("doc_id", "g")
  }

  /** (doc_id, lang, g): shingle occurrences with the training label. */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    shingleRows(docs, n)
      .join(broadcast(docs.select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))),
        Seq("doc_id"))

  /** Token counts: whitespace tokens and regex ("BPE-ish") tokens. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
        regexp_count(col("text"), lit(TokenPattern)).cast(LongType).as("bpe_tokens"),
        length(col("text")).cast(LongType).as("char_len"))
      .orderBy("doc_id")

  val textTokensSql: String = s"""
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$TokenPattern')) AS BIGINT) AS bpe_tokens,
      CAST(length(text) AS BIGINT) AS char_len
    FROM documents ORDER BY doc_id"""

  /** Quality features + composite score. All arithmetic is written in
    * the same order on both sides so doubles are bit-identical; ratios
    * rounded to 6 dp. Takes any (doc_id, text) frame so the dedup
    * pipeline can score its surviving subset.
    */
  def qualityScored(docs: DataFrame): DataFrame = {
    // Every counter is a codegen'd single pass — no split arrays, no
    // higher-order lambda (a filter(split(...), t -> t IN ...) HOF
    // drops the whole projection to interpreted eval; it was the
    // dominant per-doc cost). Identities, exact by construction:
    //  - ws_tokens: split-on-single-space token count = spaces + 1
    //    (split with limit -1 keeps empty tokens, so runs of spaces
    //    count the same both ways);
    //  - stop_tokens: a token EQUALS a stopword iff the word occurs
    //    delimited by string edge / single spaces — counted by an
    //    anchored-alternation regex (zero-width lookarounds keep
    //    adjacent stopword tokens from consuming each other's
    //    delimiter);
    //  - punct_marks: [^a-z0-9 ] count = chars remaining after
    //    deleting the allowed alphabet (translate is a per-char map).
    val stopAlt = Stopwords.mkString("|")
    val allowed = "abcdefghijklmnopqrstuvwxyz0123456789 "
    docs
      .withColumn("char_len", length(col("text")).cast(LongType))
      .withColumn("ws_tokens",
        (col("char_len") - length(translate(col("text"), " ", "")) + 1L)
          .cast(LongType))
      .withColumn("stop_tokens",
        regexp_count(col("text"),
          lit(s"(^|(?<= ))(?:$stopAlt)(?= |$$)")).cast(LongType))
      .withColumn("punct_marks",
        length(translate(col("text"), allowed, "")).cast(LongType))
      .select(col("doc_id"), col("char_len"), col("ws_tokens"),
        round(col("stop_tokens") / col("ws_tokens"), 6).as("stop_ratio"),
        round(col("punct_marks") / col("char_len"), 6).as("punct_ratio"),
        round((col("char_len") - (col("ws_tokens") - 1)) / col("ws_tokens"), 6)
          .as("mean_word_len"),
        round(
          least(col("ws_tokens") / 50.0, lit(1.0)) * 0.4
            + (lit(1.0) - col("punct_marks") / col("char_len")) * 0.3
            + least(col("stop_tokens") / col("ws_tokens") * 5.0, lit(1.0)) * 0.3,
          6).as("quality_score"))
      .orderBy("doc_id")
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    qualityScored(Tables.documents(spark, dir))

  val textQualitySql: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""
    WITH f AS (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS char_len,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS BIGINT) AS stop_tokens,
        CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS punct_marks
      FROM documents)
    SELECT doc_id, char_len, ws_tokens,
      ROUND(stop_tokens / ws_tokens, 6) AS stop_ratio,
      ROUND(punct_marks / char_len, 6) AS punct_ratio,
      ROUND((char_len - (ws_tokens - 1)) / ws_tokens, 6) AS mean_word_len,
      ROUND(LEAST(ws_tokens / 50.0, 1.0) * 0.4
        + (1.0 - punct_marks / char_len) * 0.3
        + LEAST(stop_tokens / ws_tokens * 5.0, 1.0) * 0.3, 6) AS quality_score
    FROM f ORDER BY doc_id"""
  }

  /** Document fingerprint: content hash + length band (shared blocking
    * key with dedup_exact).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(col("text").cast(BinaryType)).as("fp"),
        expr("length(text) div 100").cast(LongType).as("len_band"))
      .orderBy("doc_id")

  val textFingerprintSql: String = """
    SELECT doc_id, md5(text) AS fp,
      CAST(length(text) // 100 AS BIGINT) AS len_band
    FROM documents ORDER BY doc_id"""

  /** Language ID: self-trained multinomial naive Bayes over word
    * 3-gram shingles (+1 smoothing), argmax over candidate languages.
    * The per-language profile is built from the corpus itself (the
    * `lang` column is the training label); classification uses only
    * the document's own shingles. 96%+ accuracy on the synthetic
    * corpus with a minimum argmax margin ≳0.15 nats — far above
    * double-summation noise, so the argmax (not the scores) is
    * engine-independent and oracle-checkable.
    *
    * Scale shape: the profile is (lang × shingle-vocab) — bounded,
    * broadcastable; the doc-side join is a broadcast join on shingle,
    * then one aggregation per (doc, lang). No driver state.
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val sh = shingles(docs, 3)
    // Profile scalars (per-lang shingle totals, vocab size) collect to
    // the driver — a handful of values, folded into the plan as
    // literals. The per-shingle profile pivots to one row per shingle
    // with a count column per language: scoring is then a single
    // broadcast hash join (no langs× row blowup) and the argmax is a
    // greatest/when chain (no window shuffle). Scores are the same
    // log((c+1)/(tot+V)) sums as the oracle, summed per doc.
    // One aggregation pass over the shingle rows builds the pivoted
    // profile; per-language totals and the vocabulary size are column
    // sums / row count of that same (bounded, broadcastable) frame —
    // the naive formulation re-ran the shingling flatMap for each of
    // profile, totals, and vocabulary.
    val allLangs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    // The pivoted profile is trained MODEL STATE (lang × shingle-vocab
    // counts): catalog-served per corpus like the BPE merges — a
    // production langid model trains once and classifies every batch
    // against it; only the per-doc scoring pass below runs per query.
    val prof = graft.Materialized.ofDF(spark, dir, "text:langid-prof") {
      sh.groupBy("g").pivot("lang", allLangs).agg(count(lit(1))).localCheckpoint()
    }
    val profTotals = prof.agg(
      count(lit(1)).as("v"),
      allLangs.map(l => sum(coalesce(col(s"`$l`"), lit(0L))).as(s"t_$l")): _*).head()
    val v = profTotals.getLong(0)
    val allTot = allLangs.zipWithIndex.map { case (l, i) => l -> profTotals.getLong(i + 1) }.toMap
    // candidate languages = those with training shingles (tot > 0):
    // matches the oracle's inner join on per-language totals — a lang
    // whose docs are all shorter than the shingle width is unscorable
    val langs = allLangs.filter(allTot(_) > 0L)
    val tot = allTot.filter { case (_, t) => t > 0L }
    val scoreCols = langs.map { l =>
      sum(log((coalesce(col(s"`$l`"), lit(0L)) + 1.0) / lit((tot(l) + v).toDouble)))
        .as(s"s_$l")
    }
    val scored = sh.select("doc_id", "g")
      .join(broadcast(prof), Seq("g"))
      .groupBy("doc_id")
      .agg(scoreCols.head, scoreCols.tail: _*)
    // argmax with lang-ascending tie-break: first lang (alphabetical)
    // whose score equals the maximum.
    val best = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit(null).cast(StringType): Column) { (l, acc) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(acc)
    }
    // foldRight builds when(en)...when(zh): earliest lang wins ties.
    scored.select(col("doc_id"), pred.as("pred_lang"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("lang"))
      .orderBy("doc_id")
  }

  val textLangidSql: String = """
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    gr AS (SELECT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
           FROM (SELECT doc_id, lang, w,
                   unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
                 FROM w)),
    prof AS (SELECT lang AS cand, g, COUNT(*) AS c FROM gr GROUP BY 1, 2),
    tot AS (SELECT lang AS cand, COUNT(*) AS t FROM gr GROUP BY 1),
    vv AS (SELECT COUNT(DISTINCT g) AS v FROM gr),
    langs AS (SELECT DISTINCT lang AS cand FROM documents),
    scored AS (
      SELECT d.doc_id, l.cand,
        SUM(LN((COALESCE(p.c, 0) + 1.0) / (t.t + vv.v))) AS s
      FROM gr d
      CROSS JOIN langs l
      JOIN tot t ON t.cand = l.cand
      CROSS JOIN vv
      LEFT JOIN prof p ON p.cand = l.cand AND p.g = d.g
      GROUP BY 1, 2),
    ranked AS (SELECT doc_id, cand,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, cand) AS rn
               FROM scored)
    SELECT r.doc_id, r.cand AS pred_lang, d.lang
    FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
    WHERE rn = 1 ORDER BY r.doc_id"""

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS scheme): rolling polynomial hash over `K`-char grams,
    * then the minimum hash of every `W`-hash window (rightmost min,
    * deduped) becomes a fingerprint. Guarantee: any shared substring
    * of length ≥ W + K - 1 between two documents yields a shared
    * fingerprint — the local, position-robust document fingerprint
    * that md5 content hashing can't give. Pure JIT'd flatMap; output
    * is oracle-checked (HUGEINT mod-2^64 SQL twin below; spec pins the
    * guarantee and exact values).
    */
  val WinnowK = 8
  val WinnowW = 4
  private val HashBase = 257L

  def winnowFingerprints(docs: DataFrame, k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val n = bytes.length - k + 1
        if (n <= 0) Iterator.empty
        else {
          // rolling hash h_i of bytes[i, i+k): wrap-around Long math
          var pow = 1L
          var j = 1
          while (j < k) { pow *= HashBase; j += 1 }
          val hs = new Array[Long](n)
          var h = 0L
          var i = 0
          while (i < k) { h = h * HashBase + (bytes(i) & 0xff); i += 1 }
          hs(0) = h
          i = 1
          while (i < n) {
            h = (h - (bytes(i - 1) & 0xff) * pow) * HashBase + (bytes(i + k - 1) & 0xff)
            hs(i) = h
            i += 1
          }
          // winnow: rightmost minimum of each w-window, deduped by position
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var lastPos = -1
          var s = 0
          val wins = math.max(1, n - w + 1)
          while (s < wins) {
            var best = s
            var t = s
            val end = math.min(s + w, n)
            while (t < end) { if (hs(t) <= hs(best)) best = t; t += 1 }
            if (best != lastPos) { out += ((id, best.toLong, hs(best))); lastPos = best }
            s += 1
          }
          out.iterator
        }
      }.toDF("doc_id", "pos", "fp")
      .orderBy("doc_id", "pos")
  }

  def textWinnow(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprints(Tables.documents(spark, dir))

  /** Shared winnowing CTE for the DuckDB oracles (ADVICE r8: the
    * rolling hash is an integer polynomial, so it IS SQL-expressible).
    * The JVM's wrap-around Long arithmetic is reproduced in HUGEINT:
    * hash = Σ byte·257^(k−1−j) mod 2^64, re-signed. The winnow pick
    * (rightmost minimum of each w-window) is a ROW_NUMBER over
    * (hash ASC, pos DESC); selected positions are non-decreasing as
    * the window slides, so the Scala path's consecutive-position
    * dedupe equals a global DISTINCT.
    */
  private def winnowCteSql(k: Int = WinnowK, w: Int = WinnowW): String = {
    val pows = Array.iterate(1L, k)(_ * HashBase) // 257^0 .. 257^(k-1)
    val terms = (0 until k).map { j =>
      s"ascii(substring(text, CAST(i AS INT) + $j + 1, 1))::HUGEINT * ${pows(k - 1 - j)}::HUGEINT"
    }.mkString(" + ")
    s"""d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
       |         CAST(octet_length(encode(text)) AS BIGINT) - $k + 1 AS n
       |       FROM documents WHERE octet_length(encode(text)) >= $k),
       |hs AS (SELECT doc_id, n, i,
       |         (CASE WHEN m >= 9223372036854775808::HUGEINT
       |               THEN m - 18446744073709551616::HUGEINT ELSE m END)::BIGINT AS h
       |       FROM (SELECT doc_id, n, i,
       |               ($terms) % 18446744073709551616::HUGEINT AS m
       |             FROM (SELECT doc_id, text, n,
       |                     unnest(generate_series(0, n - 1)) AS i FROM d))),
       |win AS (SELECT doc_id, s FROM (SELECT doc_id, n,
       |          unnest(generate_series(0, greatest(n - $w, 0))) AS s FROM d)),
       |cand AS (SELECT w.doc_id, w.s, h.i, h.h,
       |           ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.s
       |             ORDER BY h.h ASC, h.i DESC) AS rn
       |         FROM win w JOIN hs h ON h.doc_id = w.doc_id
       |           AND h.i BETWEEN w.s AND w.s + ${w - 1}),
       |fps AS (SELECT DISTINCT doc_id, i, h AS fp FROM cand WHERE rn = 1)""".stripMargin
  }

  val textWinnowSql: String =
    s"""WITH ${winnowCteSql()}
       |SELECT doc_id, CAST(i AS BIGINT) AS pos, fp
       |FROM fps ORDER BY doc_id, pos""".stripMargin

  /** Top distinctive shingles per language by tf-idf (tf = occurrences
    * within the language, df = documents containing the shingle,
    * idf = ln(n_docs/df)). Token-level tf-idf is degenerate on this
    * corpus (all languages share one vocabulary), so the signal lives
    * in 3-gram shingles — same feature space as [[textLangid]].
    * Ranking is on the 6-dp-rounded score with the shingle string as
    * tie-break, so the order is engine-independent. Scale shape: one
    * agg per (lang, shingle), a broadcast df join, one top-k window
    * over ≤ langs × vocab rows.
    */
  val TfidfTopK = 3

  /** (doc_id, a, b): one row per adjacent word pair. */
  def bigramRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        if (w.length < 2) Iterator.empty
        else (0 until w.length - 1).iterator.map(i => (id, w(i), w(i + 1)))
      }.toDF("doc_id", "a", "b")
  }

  /** Per-document bigram-LM negative log-likelihood — the classic
    * perplexity-filtering quality signal (docs that the corpus' own
    * bigram statistics find surprising score high). +1-smoothed
    * P(b|a) = (c(a,b)+1)/(c(a)+V); nll = −mean log P. The count
    * tables join in plainly (AQE broadcasts them when small; at real
    * scale a bigram table is shuffle-joined). 6-dp rounding absorbs
    * summation-order noise.
    */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val bg = bigramRows(Tables.documents(spark, dir))
    val cntAb = bg.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val cntA = bg.groupBy("a").agg(count(lit(1)).as("ca"))
    val v = bg.agg(countDistinct(col("b"))).head().getLong(0)
    bg.join(cntAb, Seq("a", "b")).join(cntA, Seq("a"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log((col("cab") + 1.0) / (col("ca") + v.toDouble))) / count(lit(1)), 6)
          .as("nll"))
      .orderBy("doc_id")
  }

  val textPerplexitySql: String = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, w[i] AS a, w[i+1] AS b
           FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
                 FROM w)),
    cnt_ab AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY 1, 2),
    cnt_a AS (SELECT a, COUNT(*) AS ca FROM bg GROUP BY 1),
    vv AS (SELECT COUNT(DISTINCT b) AS v FROM bg)
    SELECT doc_id, COUNT(*) AS n_bigrams,
      ROUND(-SUM(LN((cab + 1.0) / (ca + (SELECT v FROM vv)))) / COUNT(*), 6) AS nll
    FROM bg JOIN cnt_ab USING (a, b) JOIN cnt_a USING (a)
    GROUP BY doc_id ORDER BY doc_id"""

  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = shingles(docs, 3)
    val nDocs = docs.count()
    val dfreq = sh.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
    val tf = sh.groupBy("lang", "g").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("lang").orderBy(col("tfidf").desc, col("g"))
    tf.join(broadcast(dfreq), "g")
      .withColumn("tfidf", round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= TfidfTopK)
      .select(col("lang"), col("rn"), col("g").as("term"), col("tfidf"))
      .orderBy("lang", "rn")
  }

  val textTfidfSql: String = s"""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    gr AS (SELECT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
           FROM (SELECT doc_id, lang, w,
                   unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
                 FROM w)),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    dfreq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM gr GROUP BY 1),
    tf AS (SELECT lang, g, COUNT(*) AS tf FROM gr GROUP BY 1, 2),
    s AS (SELECT lang, g, ROUND(tf * LN((SELECT n FROM nd) / df), 6) AS tfidf
          FROM tf JOIN dfreq USING (g)),
    r AS (SELECT lang, g, tfidf,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf DESC, g) AS rn
          FROM s)
    SELECT lang, CAST(rn AS BIGINT) AS rn, g AS term, tfidf
    FROM r WHERE rn <= $TfidfTopK ORDER BY lang, rn"""

  /** Top bigrams per language by raw frequency (with doc-frequency
    * alongside) — the corpus-statistics view under LM training and
    * vocabulary design. Rank on (count desc, bigram asc): exact
    * integers, engine-independent. One aggregation per (lang, bigram),
    * map-side combined; the top-k window sees only the aggregated
    * rows.
    */
  val NgramTopK = 5

  def textNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bg = bigramRows(docs)
      .join(broadcast(docs.select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))),
        Seq("doc_id"))
      .select(col("lang"), col("doc_id"), concat_ws(" ", col("a"), col("b")).as("g"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("g"))
    bg.groupBy("lang", "g")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= NgramTopK)
      .select(col("lang"), col("rn"), col("g").as("bigram"), col("n"), col("n_docs"))
      .orderBy("lang", "rn")
  }

  val textNgramsSql: String = s"""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g
           FROM (SELECT doc_id, lang, w,
                   unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
                 FROM w)),
    cnt AS (SELECT lang, g, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
            FROM bg GROUP BY 1, 2),
    r AS (SELECT lang, g, n, n_docs,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rn
          FROM cnt)
    SELECT lang, CAST(rn AS BIGINT) AS rn, g AS bigram, n, n_docs
    FROM r WHERE rn <= $NgramTopK ORDER BY lang, rn"""

  /** Document-frequency cap for [[substrDupPairs]]: fingerprints in
    * more than this many docs are boilerplate (common phrases), not
    * copy evidence — MOSS drops them for the same reason; the cap
    * also bounds the posting self-join at df².
    */
  val SubstrMaxDf = 10

  /** Minimum shared (rare) fingerprints for a reported pair — one
    * shared window can be hash luck; two is a real shared span.
    */
  val SubstrMinShared = 2

  /** Cross-document substring duplication (MOSS-style): pairs of docs
    * sharing ≥ [[SubstrMinShared]] rare winnowing fingerprints — i.e.
    * verbatim shared spans ≥ w+k−1 chars, the "quoted/copied passage"
    * signal that word-level Jaccard dilutes away on long docs. The
    * inverted-index self-join runs over RARE fingerprints only
    * (df ≤ [[SubstrMaxDf]]): common-phrase fingerprints are noise for
    * copy detection AND the quadratic hazard, so one df aggregate
    * prunes both at once. Oracle-checked via the shared winnow
    * CTE; the spec plants a copied passage.
    */
  def substrDupPairs(docs: DataFrame, k: Int = WinnowK, w: Int = WinnowW,
      maxDf: Int = SubstrMaxDf, minShared: Int = SubstrMinShared): DataFrame = {
    val fps = winnowFingerprints(docs, k, w).select("doc_id", "fp").distinct()
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select("fp")
    val keyed = fps.join(rare, "fp")
    keyed.select(col("doc_id").as("doc_a"), col("fp"))
      .join(keyed.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  def textSubstrDups(spark: SparkSession, dir: String): DataFrame =
    substrDupPairs(Tables.documents(spark, dir))

  val textSubstrDupsSql: String =
    s"""WITH ${winnowCteSql()},
       |rare AS (SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM fps)
       |         GROUP BY fp HAVING COUNT(*) <= $SubstrMaxDf),
       |keyed AS (SELECT DISTINCT doc_id, fps.fp
       |          FROM fps JOIN rare ON rare.fp = fps.fp)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM keyed a JOIN keyed b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= $SubstrMinShared
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Vocabulary size for [[textVocab]]. */
  val VocabTopK = 50

  /** Corpus vocabulary build — the first step of tokenizer training:
    * global top-[[VocabTopK]] words by occurrence count with document
    * frequency and corpus fraction. One word-level aggregation
    * (map-side combined — the shuffle carries one row per distinct
    * word, not per occurrence) feeds `orderBy().limit(VocabTopK)` —
    * TakeOrderedAndProject, per-partition bounded heaps merged on the
    * driver — never a global sort or an unpartitioned window: a 100 TB
    * web corpus has 10⁸–10⁹ distinct tokens (typos, URLs, numbers),
    * so the distinct-word table is NOT small enough to single-sort.
    * The denominator comes from `sum(n)` over the same aggregate
    * (vocabulary-sized; ReuseExchange serves both branches from one
    * shuffle), not a second pass over the exploded words. Rank is
    * attached over the ≤[[VocabTopK]] surviving rows only; rank on
    * (count desc, word asc) and a 6-dp fraction keep it engine-exact.
    */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(split(col("text"), " ")).as("w"))
    val cnt = words.groupBy("w")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
    val total = cnt.agg(sum(col("n")).cast(DoubleType).as("_total"))
    val top = cnt.orderBy(col("n").desc, col("w")).limit(VocabTopK)
    // constant-valued but non-foldable partition key (a literal would
    // be stripped by EliminateWindowPartitions, reverting to an
    // unpartitioned WindowExec): all ≤VocabTopK surviving rows rank in
    // one task, which is exactly right post-limit
    val w = Window.partitionBy(pmod(col("n"), lit(1)))
      .orderBy(col("n").desc, col("w"))
    top.crossJoin(broadcast(total))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("frac", round(col("n").cast(DoubleType) / col("_total"), 6))
      .select(col("rn"), col("w").as("word"), col("n"), col("n_docs"), col("frac"))
      .orderBy("rn")
  }

  val textVocabSql: String = s"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tot AS (SELECT COUNT(*) AS t FROM words),
    cnt AS (SELECT w, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
            FROM words GROUP BY 1),
    r AS (SELECT w, n, n_docs,
            ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rn FROM cnt)
    SELECT CAST(rn AS BIGINT) AS rn, w AS word, n, n_docs,
      ROUND(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS frac
    FROM r WHERE rn <= $VocabTopK ORDER BY rn"""

  /** Gopher-style repetition signals per document (Rae et al. 2021
    * §A1.1 use duplicate-line / duplicate-n-gram fractions as quality
    * filters): top-word concentration and the fraction of repeated
    * bigram occurrences. Two word-keyed aggregations whose shuffles
    * carry per-(doc, gram) counts — repetitive docs COMPRESS here
    * (fewer distinct grams), so the skew a repetitive corpus induces
    * shows up as smaller shuffles, not hotter keys. Integer counts +
    * 6-dp ratios keep both engines bit-identical.
    */
  def repetitionScored(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
    val wstats = wc.groupBy("doc_id").agg(
      sum(col("n")).as("n_words"),
      count(lit(1)).as("n_distinct_words"),
      max(col("n")).as("top_word_n"))
    val bstats = bigramRows(docs)
      .select(col("doc_id"), concat_ws(" ", col("a"), col("b")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        sum(col("n")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
    wstats.join(bstats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        col("top_word_n"),
        round(col("top_word_n").cast(DoubleType) / col("n_words"), 6)
          .as("top_word_frac"),
        coalesce(
          round((col("n_bigrams") - col("n_distinct_bigrams")).cast(DoubleType) /
            col("n_bigrams"), 6), lit(0.0)).as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionScored(Tables.documents(spark, dir))

  val textRepetitionSql: String = """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT doc_id, w, COUNT(*) AS n FROM words GROUP BY 1, 2),
    ws AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
             COUNT(*) AS n_distinct_words, MAX(n) AS top_word_n
           FROM wc GROUP BY 1),
    sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
           FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
                 FROM sp)),
    bc AS (SELECT doc_id, g, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    bs AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
             COUNT(*) AS n_distinct_bigrams
           FROM bc GROUP BY 1)
    SELECT ws.doc_id, n_words, n_distinct_words, top_word_n,
      ROUND(CAST(top_word_n AS DOUBLE) / n_words, 6) AS top_word_frac,
      COALESCE(ROUND(CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) /
        n_bigrams, 6), 0.0) AS dup_bigram_frac
    FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
    ORDER BY ws.doc_id"""

  /** PII patterns shared by both engines — RE2 (DuckDB) and Java
    * (Spark) compatible: no backreferences, ASCII word boundaries.
    */
  val PiiEmail = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PiiIp = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""
  val PiiPhone = """\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b"""
  val PiiLongNum = """\b[0-9]{9,}\b"""

  /** PII scrubbing — the redaction pass every training-data pipeline
    * runs before text ships: count and replace emails, IPv4s, phone
    * shapes, and long digit runs with typed placeholder tokens.
    * Pure codegen'd regexp_count/regexp_replace projections — no
    * shuffle at all until the final sort, so the pass is
    * embarrassingly parallel over document splits at any scale.
    * Replacement order (email → ip → phone → longnum) is pinned on
    * both engines so nested matches resolve identically. The shipped
    * corpus is PII-free (all-zero counts, identity scrub) — the
    * oracle certifies the plumbing; the spec plants PII to prove
    * detection and redaction.
    */
  def piiScrubbed(docs: DataFrame): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), lit(PiiEmail), lit("<EMAIL>")),
            lit(PiiIp), lit("<IP>")),
          lit(PiiPhone), lit("<PHONE>")),
        lit(PiiLongNum), lit("<NUM>"))
    docs.select(col("doc_id").cast(LongType).as("doc_id"),
        regexp_count(col("text"), lit(PiiEmail)).cast(LongType).as("n_email"),
        regexp_count(col("text"), lit(PiiIp)).cast(LongType).as("n_ip"),
        regexp_count(col("text"), lit(PiiPhone)).cast(LongType).as("n_phone"),
        regexp_count(col("text"), lit(PiiLongNum)).cast(LongType).as("n_longnum"),
        md5(scrubbed.cast(BinaryType)).as("scrubbed_fp"))
      .orderBy("doc_id")
  }

  def textPiiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrubbed(Tables.documents(spark, dir))

  val textPiiScrubSql: String = s"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '$PiiEmail')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(text, '$PiiIp')) AS BIGINT) AS n_ip,
      CAST(len(regexp_extract_all(text, '$PiiPhone')) AS BIGINT) AS n_phone,
      CAST(len(regexp_extract_all(text, '$PiiLongNum')) AS BIGINT) AS n_longnum,
      md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        '$PiiEmail', '<EMAIL>', 'g'),
        '$PiiIp', '<IP>', 'g'),
        '$PiiPhone', '<PHONE>', 'g'),
        '$PiiLongNum', '<NUM>', 'g')) AS scrubbed_fp
    FROM documents ORDER BY doc_id"""

  /** Benchmark decontamination (n-gram overlap): flag corpus documents
    * that share any `DecontamN`-word shingle with a pinned held-out
    * benchmark set (docs with doc_id % 25 == 3 stand in for an eval
    * suite). This is the standard pre-training hygiene pass — eval
    * questions leaking into training data inflate benchmark scores.
    *
    * Scale shape: the benchmark gram set is tiny relative to the
    * corpus at any scale (eval suites are fixed-size; the corpus is
    * the 100 TB side), so it broadcasts and the corpus side is one
    * shingling pass + a broadcast hash join — no shuffle before the
    * per-doc aggregation, which carries matched rows only.
    */
  val DecontamN = 8
  private[graft] val BenchMod = 25
  private[graft] val BenchRes = 3

  def decontaminated(docs: DataFrame): DataFrame = {
    val grams = shingleRows(docs, DecontamN)
    val bench = grams.where(col("doc_id") % BenchMod === BenchRes)
      .select(col("doc_id").as("bench_id"), col("g")).distinct()
    val corpus = grams.where(col("doc_id") % BenchMod =!= BenchRes)
    val hits = corpus.join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(countDistinct("g").as("n_hit_grams"),
        countDistinct("bench_id").as("n_bench_docs"))
    docs.select(col("doc_id").cast(LongType).as("doc_id"))
      .where(col("doc_id") % BenchMod =!= BenchRes)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).cast(IntegerType)
          .as("contaminated"))
      .orderBy("doc_id")
  }

  def textDecontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminated(Tables.documents(spark, dir))

  val textDecontaminateSql: String = {
    val gram = (0 until DecontamN).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    gr AS (SELECT doc_id, $gram AS g
           FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - ${DecontamN - 1}, 0))) AS i
                 FROM w)),
    bench AS (SELECT DISTINCT doc_id AS bench_id, g FROM gr WHERE doc_id % $BenchMod = $BenchRes),
    corpus AS (SELECT doc_id, g FROM gr WHERE doc_id % $BenchMod <> $BenchRes),
    hits AS (SELECT c.doc_id,
               COUNT(DISTINCT c.g) AS n_hit_grams,
               COUNT(DISTINCT b.bench_id) AS n_bench_docs
             FROM corpus c JOIN bench b ON b.g = c.g GROUP BY 1)
    SELECT d.doc_id,
      CAST(COALESCE(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
      CAST(COALESCE(h.n_bench_docs, 0) AS BIGINT) AS n_bench_docs,
      CAST(COALESCE(h.n_hit_grams, 0) > 0 AS INTEGER) AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % $BenchMod <> $BenchRes
    ORDER BY d.doc_id"""
  }

  /** Compression-ratio quality signal (the zlib filter from the Gopher
    * / MassiveText cleaning recipe): highly repetitive or
    * boilerplate text compresses far below natural prose, so
    * deflate(text).length / text.length is a cheap one-pass quality
    * feature. Computed in a typed mapPartitions with one reused
    * Deflater per partition (JIT'd, zero shuffle until the final
    * sort — embarrassingly parallel over document splits at 100 TB).
    * rows-only in the gate: the exact deflate byte count is a zlib
    * implementation detail, so the spec pins the invariants (ordering
    * of repetitive vs diverse text, determinism, bounds) instead of
    * an oracle.
    */
  def compressionRatios(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          d.reset(); d.setInput(raw); d.finish()
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          (id, raw.length.toLong, n,
            if (raw.length == 0) 1.0 else math.rint(n.toDouble / raw.length * 1e6) / 1e6)
        }
      }.toDF("doc_id", "raw_len", "comp_len", "comp_ratio")
      .orderBy("doc_id")
  }

  def textCompressRatio(spark: SparkSession, dir: String): DataFrame =
    compressionRatios(Tables.documents(spark, dir))

  /** Training-sequence length for [[textPackSequences]]. */
  val PackSeqLen = 2048L

  /** Concat-and-chunk sequence packing (the GPT-pretraining batching
    * step): documents are concatenated in doc_id order within each
    * language stream and cut into fixed [[PackSeqLen]]-token training
    * sequences; each doc gets its token span [start_tok, start_tok +
    * n_tokens), its first/last sequence id, and how many sequences it
    * spans (> 1 = crosses a boundary). The prefix sum is a window
    * partitioned by lang — per-stream state, never a global order —
    * so at 100 TB each language stream packs independently (and a
    * finer stream key, e.g. (lang, shard), drops in without changing
    * the shape). Integer token counts and `div` keep both engines
    * bit-identical.
    */
  def textPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"start_tok div $PackSeqLen"))
      .withColumn("seq_last", expr(s"(start_tok + n_tokens - 1) div $PackSeqLen"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
      .orderBy("lang", "doc_id")
  }

  val textPackSequencesSql: String = s"""
    WITH t AS (
      SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
      FROM t)
    SELECT doc_id, lang, n_tokens, start_tok,
      start_tok // $PackSeqLen AS seq_first,
      (start_tok + n_tokens - 1) // $PackSeqLen AS seq_last,
      (start_tok + n_tokens - 1) // $PackSeqLen - start_tok // $PackSeqLen + 1 AS n_seqs
    FROM c ORDER BY lang, doc_id"""

  /** Chunk geometry for [[textChunkOverlap]]: 64-token windows every
    * 48 tokens (16-token overlap — the RAG/pretraining default shape).
    */
  val ChunkLen = 64L
  val ChunkStride = 48L

  /** Sliding-window chunking with overlap (the context-window chunker
    * every RAG / pretraining ingest runs): each document becomes
    * [[ChunkLen]]-token chunks starting every [[ChunkStride]] tokens.
    * A tail start is emitted only if it contributes tokens beyond the
    * previous chunk's coverage (start = 0 ∨ start + overlap < n), so
    * chunks never duplicate a suffix already fully covered. Purely
    * per-row (split → filtered `sequence` → posexplode → slice): no
    * shuffle at all before the gate's cosmetic orderBy — the 100 TB
    * plan is scan → generate → write, embarrassingly parallel. The
    * chunk ordinal is the generator's own position index, not a window.
    */
  def textChunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ov = ChunkLen - ChunkStride
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")).cast(LongType))
      .select(col("doc_id"), col("ws"), col("n"),
        posexplode(expr(
          s"filter(sequence(0L, n - 1L, ${ChunkStride}L), s -> s = 0 OR s + $ov < n)")))
      .select(col("doc_id"), col("pos").cast(LongType).as("chunk_id"),
        col("col").as("start_tok"),
        least(lit(ChunkLen), col("n") - col("col")).as("n_tokens"),
        concat_ws(" ", expr(s"slice(ws, col + 1, $ChunkLen)")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  val textChunkOverlapSql: String = s"""
    WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        string_split(text, ' ') AS ws,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    ex AS (SELECT doc_id, ws, n,
        unnest(generate_series(0, n - 1, $ChunkStride)) AS s
      FROM t),
    st AS (SELECT doc_id, ws, n, s,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_id
      FROM ex WHERE s = 0 OR s + ${ChunkLen - ChunkStride} < n)
    SELECT doc_id, chunk_id, s AS start_tok,
      LEAST($ChunkLen, n - s) AS n_tokens,
      array_to_string(list_slice(ws, s + 1, s + $ChunkLen), ' ') AS chunk_text
    FROM st ORDER BY doc_id, chunk_id"""

  /** Merge rounds for [[textBpeTrain]] (the unrolled-oracle bound; a
    * production vocabulary runs the same loop 30k rounds).
    */
  val BpeRounds = 6

  /** Distributed BPE tokenizer training (Sennrich et al. 2016, the
    * vocabulary-driven formulation): learn [[BpeRounds]] merge rules
    * over the corpus — per round, count adjacent symbol pairs across
    * the word vocabulary (weighted by word frequency), pick the most
    * frequent pair under the deterministic (count DESC, left, right)
    * order, and re-segment every word by greedy left-to-right
    * non-overlapping replacement. Output is the merge TABLE — the
    * `merges.txt` artifact a tokenizer ships — one row per round:
    * (round, left_sym, right_sym, merged, pair_count).
    *
    * Scale shape — the reason BPE training distributes at 100 TB:
    * after the one corpus-wide word count (a map-side-combined
    * aggregation — the only pass that ever touches raw text), ALL
    * rounds run over the compressed (word, count, symbols) vocabulary
    * frame, which is |distinct words|-sized regardless of corpus
    * bytes. Per round: one pair-count aggregation (explode of ≤|word|
    * adjacent pairs per vocab row, map-side partial), one
    * TakeOrdered(1) for the argmax, and one scan-side re-segmentation
    * (an `aggregate` fold — greedy left-to-right merge is a linear
    * fold, no shuffle). Driver state: the [[BpeRounds]] merge rows —
    * the model being trained, the irreducible driver payload (same
    * contract as k-means centroids). Oracle: the identical rounds
    * unrolled in SQL, greedy re-segmentation as a per-word
    * position-scan recursive CTE.
    */
  def textBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeStateFor(spark, dir).merges

  /** Trained BPE state: the merge table plus the final per-word
    * segmentation (the vocabulary the encoder joins against). Shared
    * per (session, dir) through the [[graft.Materialized]] catalog —
    * training and encoding read ONE training run, the same
    * load-once-query-many model as the derived graphs and the k-means
    * centroid catalog.
    */
  private[graft] case class BpeState(merges: DataFrame, seg: DataFrame)

  private def bpeStateFor(spark: SparkSession, dir: String): BpeState = {
    // Two disk-backed frame entries sharing ONE lazy training run: if
    // both are cached (the steady state) training never runs; a partial
    // cache (crash between the two writes) retrains once — the trainer
    // is deterministic, so the halves can never disagree.
    lazy val trained = bpeTrain(Tables.documents(spark, dir), BpeRounds)
    BpeState(
      graft.Materialized.ofDF(spark, dir, "text:bpe-merges")(trained.merges),
      graft.Materialized.ofDF(spark, dir, "text:bpe-seg")(trained.seg))
  }

  /** The training loop over any frame with a `text` column (see
    * [[textBpeTrain]] for the contract and scale shape). */
  def bpeMerges(docs: DataFrame, rounds: Int = BpeRounds): DataFrame =
    bpeTrain(docs, rounds).merges

  private[graft] def bpeTrain(docs: DataFrame, rounds: Int): BpeState = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    var seg = words.select(col("w"), col("n"),
      concat(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))),
        array(lit("</w>"))).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      r += 1
      // Sennrich-style early stop: a small corpus can exhaust its
      // mergeable pairs before `rounds` (every word fully merged to one
      // symbol) — then the pair frame is EMPTY and training is done;
      // return the merges learned so far with seg unchanged. The oracle
      // chain tolerates the same case (best$r LEFT JOIN ON TRUE carries
      // seg forward and emits no merge row for the exhausted round).
      // try_element_at + null-filter, NOT element_at over sequence(1,
      // size-1): Spark's sequence(1, 0) is the DESCENDING [1, 0], so a
      // fully-merged single-symbol word (size(s) = 1 — reachable as
      // soon as any short word collapses before the round budget ends)
      // would evaluate element_at(s, 2) and throw.
      val bestRows = seg.select(col("n"), explode(
          transform(sequence(lit(1), greatest(size(col("s")) - 1, lit(1))),
            i => struct(element_at(col("s"), i).as("a"),
              try_element_at(col("s"), i + 1).as("b")))).as("p"))
        .where(col("p.b").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .take(1)
      if (bestRows.isEmpty) exhausted = true
      else {
        val best = bestRows.head
        val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((r.toLong, a, b, a + b, cnt))
        // greedy left-to-right merge as a fold: a freshly-merged symbol
        // (the string a||b) can never equal the bare `a`, so the fold's
        // last-element test is exactly non-overlapping greedy semantics
        val fold = aggregate(col("s"), array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        seg = seg.select(col("w"), col("n"), fold.as("s")).localCheckpoint()
      }
    }
    BpeState(
      merges.toSeq.toDF("round", "left_sym", "right_sym", "merged", "pair_count"),
      seg)
  }

  /** Batched BPE training — the production-vocabulary scale path. The
    * sequential trainer ([[bpeTrain]]) runs one Spark job round per
    * merge: exact, but a 30k-merge vocabulary means 30k sequential
    * driver rounds. This variant learns up to `batch` merges per
    * corpus pass using the standard distributed-BPE batching: rank
    * pairs by the same (count DESC, left, right) order, then greedily
    * keep pairs whose symbols are DISJOINT from every
    * earlier-selected pair's (and whose merged string collides with
    * neither) — disjointness makes the selected merges commute (one
    * merge can neither create, destroy, nor re-rank another selected
    * pair's occurrences), so one left-to-right scan applies them all.
    *
    * Deviation contract vs sequential: within a pass, a merge CAN
    * create a brand-new pair (x, ab) whose count exceeds a
    * later-selected pair's — sequential would learn that new pair
    * first. Batched training is therefore equal to sequential
    * whenever each selected count dominates the pass's created
    * pairs (TextSpec pins exact equality on such a corpus, and
    * `batch = 1` degenerates to the sequential order exactly); on
    * natural corpora the deviation is the well-known benign
    * reordering every batched/parallel BPE implementation accepts.
    * Scale shape: rounds/batch corpus passes instead of rounds — a
    * 32k vocabulary in ~500 passes at batch=64; per-pass work is the
    * same |vocab|-sized pair count + one scan-side merge apply.
    */
  def bpeTrainBatched(docs: DataFrame, rounds: Int, batch: Int = 64): BpeState = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(batch >= 1, "batch must be >= 1")
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    var seg = words.select(col("w"), col("n"),
      concat(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))),
        array(lit("</w>"))).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    while (merges.size < rounds && !exhausted) {
      val want = math.min(batch, rounds - merges.size)
      // Oversample 4× before the conflict filter: adjacent ranked pairs
      // often chain (share a symbol), so the top `want` rows rarely
      // yield `want` disjoint pairs. Undershoot is benign — the next
      // pass recounts and the remaining budget re-ranks.
      val ranked = seg.select(col("n"), explode(
          transform(sequence(lit(1), greatest(size(col("s")) - 1, lit(1))),
            i => struct(element_at(col("s"), i).as("a"),
              try_element_at(col("s"), i + 1).as("b")))).as("p"))
        .where(col("p.b").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(want * 4)
        .collect()
      if (ranked.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        ranked.iterator.takeWhile(_ => sel.size < want).foreach { r =>
          val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(a) && !used(b) && !used(a + b)) {
            sel += ((a, b, cnt)); used += a; used += b; used += (a + b)
          }
        }
        sel.foreach { case (a, b, cnt) =>
          merges += ((merges.size + 1L, a, b, a + b, cnt))
        }
        val pairMap = sel.map { case (a, b, _) => (a, b) -> (a + b) }.toMap
        val bsel = spark.sparkContext.broadcast(pairMap)
        // one greedy left-to-right scan applies every selected merge
        // (disjointness makes the order within the scan immaterial)
        seg = seg.select(col("w"), col("n"), col("s"))
          .as[(String, Long, Seq[String])]
          .map { case (w, n, s) =>
            val m = bsel.value
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              val merged = if (i + 1 < s.length) m.get((s(i), s(i + 1))) else None
              merged match {
                case Some(ab) => out += ab; i += 2
                case None     => out += s(i); i += 1
              }
            }
            (w, n, out.toSeq)
          }.toDF("w", "n", "s").localCheckpoint()
      }
    }
    BpeState(
      merges.toSeq.toDF("round", "left_sym", "right_sym", "merged", "pair_count"),
      seg)
  }

  /** Tokenizer application — encode the corpus with the trained
    * merges: per document, the BPE token count is the sum of its
    * words' trained segmentation lengths, next to the whitespace word
    * count and the chars-per-token compression the tokenizer achieves.
    * Scale shape: the trained vocabulary (word → |symbols|) is
    * vocabulary-sized and broadcastable; encoding is one broadcast
    * join on the exploded word stream + one doc-keyed aggregation —
    * the raw text is touched exactly once. Training cost is paid once
    * per (session, dir) through the catalog ([[bpeStateFor]]).
    */
  def textBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val seg = bpeStateFor(spark, dir).seg
    val docs = Tables.documents(spark, dir)
    val words = docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
    words.join(broadcast(seg.select(col("w"), size(col("s")).cast(LongType).as("k"))), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("bpe_tokens"))
      .join(docs.select(col("doc_id").cast(LongType).as("doc_id"),
        length(col("text")).cast(LongType).as("n_chars")), "doc_id")
      .select(col("doc_id"), col("n_words"), col("bpe_tokens"),
        round(col("n_chars").cast(DoubleType) / col("bpe_tokens"), 6)
          .as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Shared oracle prefix: the unrolled training chain (w0, seg0,
    * cnt/best/ap/seg per round) both BPE oracles build on.
    */
  private def bpeChainSql: String = {
    def roundCtes(r: Int): String = {
      val p = r - 1
      s"""cnt$r AS MATERIALIZED (SELECT s[i] AS a, s[i+1] AS b,
         |    CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, s, unnest(generate_series(1, len(s)-1)) AS i FROM seg$p)
         |  GROUP BY 1, 2),
         |best$r AS MATERIALIZED (SELECT a, b, cnt FROM cnt$r
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |ap$r AS (SELECT w, n, s, 1 AS i, CAST([] AS VARCHAR[]) AS out FROM seg$p
         |  UNION ALL
         |  SELECT ap.w, ap.n, ap.s,
         |    CASE WHEN ap.i < len(ap.s) AND ap.s[ap.i] = best$r.a
         |              AND ap.s[ap.i+1] = best$r.b
         |         THEN ap.i + 2 ELSE ap.i + 1 END,
         |    list_append(ap.out,
         |      CASE WHEN ap.i < len(ap.s) AND ap.s[ap.i] = best$r.a
         |                AND ap.s[ap.i+1] = best$r.b
         |           THEN best$r.a || best$r.b ELSE ap.s[ap.i] END)
         |  FROM ap$r ap LEFT JOIN best$r ON TRUE WHERE ap.i <= len(ap.s)),
         |seg$r AS MATERIALIZED (SELECT w, n, out AS s FROM ap$r
         |  WHERE i = len(s) + 1)""".stripMargin
    }
    val rounds = (1 to BpeRounds).map(roundCtes).mkString(",\n")
    s"""WITH RECURSIVE
       |w0 AS MATERIALIZED (SELECT w, COUNT(*) AS n FROM
       |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |seg0 AS MATERIALIZED (SELECT w, n,
       |    list_append(list_transform(generate_series(1, length(w)),
       |      i -> substr(w, i, 1)), '</w>') AS s
       |  FROM w0),
       |$rounds""".stripMargin
  }

  val textBpeTrainSql: String = {
    val out = (1 to BpeRounds).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS round, a AS left_sym, b AS right_sym,
         |  a || b AS merged, cnt AS pair_count FROM best$r""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""$bpeChainSql
       |$out
       |ORDER BY round""".stripMargin
  }

  val textBpeEncodeSql: String =
    s"""$bpeChainSql,
       |dwf AS (SELECT doc_id, w FROM
       |    (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0),
       |enc AS (SELECT doc_id, COUNT(*) AS n_words,
       |    CAST(SUM(len(s)) AS BIGINT) AS bpe_tokens
       |  FROM dwf JOIN seg$BpeRounds USING (w) GROUP BY doc_id)
       |SELECT d.doc_id, enc.n_words, enc.bpe_tokens,
       |  ROUND(CAST(length(d.text) AS DOUBLE) / enc.bpe_tokens, 6) AS chars_per_token
       |FROM enc JOIN documents d ON d.doc_id = enc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Flesch reading-ease readability per document — the standard
    * text-quality gate feature next to [[textQuality]]'s ratio score.
    * Syllables are vowel-group runs (`[aeiouy]+`, the classic
    * dictionary-free heuristic), sentences are terminal-punctuation
    * runs clamped to ≥ 1 (synthetic corpora may carry none), words are
    * whitespace tokens. flesch = 206.835 − 1.015·(words/sentence) −
    * 84.6·(syllables/word), banded easy/medium/hard at the textbook
    * 70/50 cuts. Every input to the double math is an integer count,
    * and the expression tree is written identically on both engines,
    * so the 4-dp round compares literals — and the band compare runs
    * on the unrounded double, which is bit-identical for the same
    * reason.
    *
    * Scale shape: pure per-row projection over a pruned (doc_id, text)
    * scan — three regex counters inside whole-stage codegen, no
    * shuffle but the gate's canonical ORDER BY. The 100 TB readability
    * pass is a map-only job.
    */
  def textReadability(spark: SparkSession, dir: String): DataFrame =
    textReadabilityAt(spark, dir, easyCut = 70, medCut = 50)

  /** Parameterized twin (the fuzz family draws the band cuts; integer
    * cuts render as X.0 literals on both engines, and the compare runs
    * on the identical unrounded double).
    */
  private[graft] def textReadabilityAt(spark: SparkSession, dir: String,
      easyCut: Int, medCut: Int): DataFrame = {
    val words = greatest(size(split(col("text"), " ")).cast(LongType), lit(1L))
    val syll = regexp_count(col("text"), lit("[aeiouy]+")).cast(LongType)
    val sent = greatest(regexp_count(col("text"), lit("[.!?]+")).cast(LongType), lit(1L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("n_words"), syll.as("n_syll"), sent.as("n_sent"))
      .withColumn("flesch",
        lit(206.835) - lit(1.015) * (col("n_words") / col("n_sent"))
          - lit(84.6) * (col("n_syll") / col("n_words")))
      .select(col("doc_id"), col("n_words"), col("n_syll"), col("n_sent"),
        round(col("flesch"), 4).as("flesch"),
        when(col("flesch") >= easyCut.toDouble, "easy")
          .when(col("flesch") >= medCut.toDouble, "medium")
          .otherwise("hard").as("band"))
      .orderBy("doc_id")
  }

  def textReadabilitySqlAt(easyCut: Int, medCut: Int): String = s"""
    WITH f AS (
      SELECT doc_id,
        GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS n_words,
        CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syll,
        GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sent
      FROM documents),
    s AS (
      SELECT doc_id, n_words, n_syll, n_sent,
        206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syll / n_words) AS flesch
      FROM f)
    SELECT doc_id, n_words, n_syll, n_sent,
      ROUND(flesch, 4) AS flesch,
      CASE WHEN flesch >= $easyCut.0 THEN 'easy'
           WHEN flesch >= $medCut.0 THEN 'medium'
           ELSE 'hard' END AS band
    FROM s ORDER BY doc_id"""

  val textReadabilitySql: String = textReadabilitySqlAt(70, 50)

  /** Collocation pairs below this corpus count are noise, not phrases. */
  val CollocMinCount = 5L

  /** Corpus collocation mining: pointwise mutual information of every
    * adjacent word pair seen ≥ [[CollocMinCount]] times —
    * PMI = ln(P(a,b) / (P(a)·P(b))) with P(a,b) over bigram positions
    * and P(w) over token positions, i.e.
    * ln(c_ab · n_tok² / (n_bi · c_a · c_b)). The standard
    * phrase-detection signal (Church–Hanks) feeding tokenizer vocab
    * curation and boilerplate discovery. Every log argument is a ratio
    * of exact integer counts combined in the identical expression tree
    * on both engines, so ROUND(6) compares literals.
    *
    * Scale shape: bigrams come from zipping each document's token
    * array with its own tail — a Generate over the pruned text scan,
    * no self-join, no window. Two count aggregations (unigram, bigram)
    * shuffle vocabulary-sized streams with map-side combine; the PMI
    * join runs on surviving pairs only, with the two 1-row totals
    * broadcast. The 100 TB plan is scan → explode → two combines.
    */
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum(col("c")).as("n_tok"))
    val nBi = toks.where(size(col("w")) >= 2)
      .agg(sum(size(col("w")).cast(LongType) - 1L).as("n_bi"))
    val bi = toks.where(size(col("w")) >= 2)
      .select(explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= CollocMinCount)
    bi.join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("n_pair"), col("c1"), col("c2"),
        round(log(
          (col("n_pair") * col("n_tok").cast(DoubleType) * col("n_tok"))
            / (col("n_bi").cast(DoubleType) * col("c1") * col("c2"))), 6).as("pmi"))
      .orderBy("w1", "w2")
  }

  val textCollocationsSql: String = s"""
    WITH tk AS (SELECT string_split(text, ' ') AS w FROM documents),
    uni AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT UNNEST(w) AS tok FROM tk) GROUP BY tok),
    ntok AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
    nbi AS (
      SELECT CAST(SUM(len(w) - 1) AS BIGINT) AS n_bi
      FROM tk WHERE len(w) >= 2),
    bi AS (
      SELECT w[i] AS w1, w[i + 1] AS w2, COUNT(*) AS n_pair
      FROM tk, UNNEST(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2
      GROUP BY 1, 2
      HAVING COUNT(*) >= $CollocMinCount)
    SELECT bi.w1, bi.w2, bi.n_pair, u1.c AS c1, u2.c AS c2,
      ROUND(LN((bi.n_pair * CAST(ntok.n_tok AS DOUBLE) * ntok.n_tok)
        / (CAST(nbi.n_bi AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
    FROM bi JOIN uni u1 ON u1.tok = bi.w1 JOIN uni u2 ON u2.tok = bi.w2,
      ntok, nbi
    ORDER BY w1, w2"""

  /** Zipf fit: tokens per language entering the regression. */
  val ZipfTopN = 200

  /** Zipf's-law fit per language: least-squares slope of ln(count) on
    * ln(rank) over each language's top-[[ZipfTopN]] tokens — the
    * corpus-health diagnostic (natural text slopes ≈ −1; generated or
    * templated text drifts). Every log argument is an INTEGER (rank,
    * count — same double input on both engines); the four regression
    * terms round to 9 dp and sum as exact decimals (the q_entropy
    * pattern), so the closed-form slope/intercept divisions run on
    * identical doubles at ROUND(6).
    *
    * Scale shape: one vocabulary-sized count shuffle (map-side
    * combine); the per-language rank window is a group-limit the
    * optimizer cuts to [[ZipfTopN]] rows per map task
    * (InferWindowGroupLimit — the q_kmv_sketch shape), and the
    * regression folds ≤ 5 × 200 decimal rows.
    */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    val uni = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("tok"))
    val top = uni.withColumn("r", row_number().over(w)).where(col("r") <= ZipfTopN)
    val dec9 = (c: Column) => round(c, 9).cast(DecimalType(28, 9))
    val terms = top.select(col("lang"),
      dec9(log(col("r"))).as("x"),
      dec9(log(col("c"))).as("y"),
      dec9(log(col("r")) * log(col("c"))).as("xy"),
      dec9(log(col("r")) * log(col("r"))).as("xx"))
    terms.groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum(col("xy")).cast(DoubleType).as("sxy"),
        sum(col("xx")).cast(DoubleType).as("sxx"))
      .select(col("lang"), col("n_tokens"),
        round((col("n_tokens") * col("sxy") - col("sx") * col("sy"))
          / (col("n_tokens") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
        round((col("sy") - (col("n_tokens") * col("sxy") - col("sx") * col("sy"))
          / (col("n_tokens") * col("sxx") - col("sx") * col("sx")) * col("sx"))
          / col("n_tokens"), 6).as("intercept"))
      .orderBy("lang")
  }

  val textZipfSql: String = s"""
    WITH uni AS (
      SELECT lang, tok, COUNT(*) AS c
      FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY lang, tok),
    top AS (
      SELECT lang, c, r FROM (
        SELECT lang, c,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS r
        FROM uni) WHERE r <= $ZipfTopN),
    terms AS (
      SELECT lang,
        CAST(ROUND(LN(r), 9) AS DECIMAL(28,9)) AS x,
        CAST(ROUND(LN(c), 9) AS DECIMAL(28,9)) AS y,
        CAST(ROUND(LN(r) * LN(c), 9) AS DECIMAL(28,9)) AS xy,
        CAST(ROUND(LN(r) * LN(r), 9) AS DECIMAL(28,9)) AS xx
      FROM top),
    ag AS (
      SELECT lang, COUNT(*) AS n_tokens,
        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx
      FROM terms GROUP BY lang)
    SELECT lang, n_tokens,
      ROUND((n_tokens * sxy - sx * sy) / (n_tokens * sxx - sx * sx), 6) AS zipf_slope,
      ROUND((sy - (n_tokens * sxy - sx * sy) / (n_tokens * sxx - sx * sx) * sx)
        / n_tokens, 6) AS intercept
    FROM ag ORDER BY lang"""

  def ops: Seq[Op] = Seq(
    Op("text_collocations", textCollocations, Some(textCollocationsSql)),
    Op("text_zipf", textZipf, Some(textZipfSql)),
    Op("text_readability", textReadability, Some(textReadabilitySql)),
    Op("text_bpe_train", textBpeTrain, Some(textBpeTrainSql)),
    Op("text_bpe_encode", textBpeEncode, Some(textBpeEncodeSql)),
    Op("text_tokens", textTokens, Some(textTokensSql)),
    Op("text_quality", textQuality, Some(textQualitySql)),
    Op("text_fingerprint", textFingerprint, Some(textFingerprintSql)),
    Op("text_winnow", textWinnow, Some(textWinnowSql)),
    Op("text_langid", textLangid, Some(textLangidSql)),
    Op("text_tfidf", textTfidf, Some(textTfidfSql)),
    Op("text_ngrams", textNgrams, Some(textNgramsSql)),
    Op("text_perplexity", textPerplexity, Some(textPerplexitySql)),
    Op("text_vocab", textVocab, Some(textVocabSql)),
    Op("text_repetition", textRepetition, Some(textRepetitionSql)),
    Op("text_pii_scrub", textPiiScrub, Some(textPiiScrubSql)),
    Op("text_substr_dups", textSubstrDups, Some(textSubstrDupsSql)),
    Op("text_decontaminate", textDecontaminate, Some(textDecontaminateSql)),
    Op("text_compress_ratio", textCompressRatio, None),
    Op("text_pack_sequences", textPackSequences, Some(textPackSequencesSql)),
    Op("text_chunk_overlap", textChunkOverlap, Some(textChunkOverlapSql)),
  )
}
