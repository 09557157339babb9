package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language identification, quality scoring,
  * and document fingerprinting. All are pure column expressions (whole-stage
  * codegen, no UDFs) with exact pure-Scala twins for tests, and all hashing
  * derives from md5 so independent engines can replay it bit-for-bit.
  */
object TextAnalysis {

  // --------------------------------------------------------- hashing -------
  /** 60-bit hash: first 15 hex chars of md5, parsed base-16. Fits a signed
    * 64-bit int with headroom; reproducible in any engine with md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Bytes(s: String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def hash60(s: String): Long = {
    // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    val d = md5Bytes(s)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** 32-bit variant (first 8 hex chars) for bit-level ops like SimHash. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def hash32(s: String): Long = {
    // first 8 hex chars = bytes 0..3
    val d = md5Bytes(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  // ------------------------------------------------------ tokenization -----
  /** Lowercased word tokens: split on non-word runs, empties dropped. */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => t =!= "")

  def tokens(text: String): Seq[String] =
    if (text == null) Seq.empty
    else text.toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty)

  /** Whitespace token count. Both forms regex-trim (`\s`) before splitting
    * so they agree exactly: SQL `trim` strips only spaces and Spark's split
    * keeps trailing empty fields, which over-counted text ending in
    * control whitespace before. */
  def wsTokenCountCol(text: Column): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(length(t) === 0, 0).otherwise(size(split(t, "\\s+")))
  }

  def wsTokenCount(text: String): Int = {
    if (text == null) return 0
    val t = text.replaceAll("^\\s+|\\s+$", "")
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  /** BPE-ish token count: letter runs, single digits, single punctuation —
    * the classic ~"1 token per word-piece" pre-tokenizer shape. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  def bpeTokenCount(text: String): Int = {
    if (text == null) return 0
    val m = java.util.regex.Pattern.compile(BpePattern).matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // ------------------------------------------------------ language id ------
  /** Tiny deterministic stopword profiles. Order = tie-break priority. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "une", "dans"))

  private def profileCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** N-gram/stopword language ID: CJK presence → zh; else the profile with
    * the highest stopword-token count, ties broken by profile order. */
  def langIdCol(text: Column): Column = {
    val toks = tokensCol(text)
    val cjk = length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", "")) > 0
    val counts = LangProfiles.map { case (lang, words) => lang -> profileCount(toks, words) }
    val Seq(en, es, de, fr) = counts.map(_._2)
    when(cjk, "zh")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  def langId(text: String): String = {
    if (text == null) return "en"
    if (text.exists(c => c >= 0x4E00 && c <= 0x9FFF)) return "zh"
    val toks = tokens(text)
    val counts = LangProfiles.map { case (lang, words) =>
      lang -> toks.count(words.contains)
    }
    // first profile achieving the max count (profile order = priority)
    val mx = counts.map(_._2).max
    counts.find(_._2 == mx).map(_._1).getOrElse("en")
  }

  /** Per-paragraph language mix: paragraphs classified with [[langIdCol]],
    * then per-document `n_paras`, `n_langs` (distinct predictions),
    * `primary_lang` (most frequent, ties to zh < en < es < de < fr — the
    * CJK override first, then profile order), and a `mixed` flag — the
    * cheap wrong-language-routing / machine-translation-spam signal.
    *
    * Plan: narrow paragraph explode → partial-agg (id, lang) groupBy
    * (≤5 rows per doc reach the shuffle) → per-doc window over those ≤5
    * rows + final agg. Two id-key shuffles, state bounded by the language
    * inventory. */
  def langMixDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = filter(transform(split(col(textCol), "\n\\s*\n"),
      p => regexp_replace(p, "^\\s+|\\s+$", "")), p => p =!= "")
    val pl = df.select(col(idCol), explode(paras).as("__p"))
      .select(col(idCol), langIdCol(col("__p")).as("lang"))
    val counts = pl.groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("__c"))
    val rank = when(col("lang") === "zh", 0).when(col("lang") === "en", 1)
      .when(col("lang") === "es", 2).when(col("lang") === "de", 3)
      .otherwise(4)
    val w = Window.partitionBy(idCol).orderBy(col("__c").desc, rank.asc)
    counts.withColumn("__rn", row_number().over(w))
      .groupBy(idCol).agg(
        sum("__c").cast("long").as("n_paras"),
        count(lit(1)).cast("long").as("n_langs"),
        max(when(col("__rn") === 1, col("lang"))).as("primary_lang"))
      .withColumn("mixed", col("n_langs") >= 2)
  }

  /** Pure twin of [[langMixDf]]: (n_paras, n_langs, primary, mixed);
    * None for documents with no non-empty paragraph. */
  def langMix(text: String): Option[(Long, Long, String, Boolean)] = {
    val paras = (if (text == null) "" else text).split("\n\\s*\n", -1).toSeq
      .map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)
    if (paras.isEmpty) return None
    val rank = Map("zh" -> 0, "en" -> 1, "es" -> 2, "de" -> 3, "fr" -> 4)
    val counts = paras.map(langId).groupBy(identity)
      .view.mapValues(_.size).toMap
    val primary = counts.toSeq.minBy { case (l, c) => (-c, rank(l)) }._1
    Some((paras.size.toLong, counts.size.toLong, primary, counts.size >= 2))
  }

  // --------------------------------------------------- quality scoring -----
  /** Deterministic [0,1] quality composite from length, alpha ratio,
    * punctuation density, and stopword ratio — the classic cheap pre-filter
    * before expensive pipeline stages. Rounded to 4 dp for engine parity. */
  def qualityScoreCol(text: Column): Column = {
    val n = greatest(length(text), lit(1)).cast("double")
    val alpha = (length(text) - length(regexp_replace(text, "[A-Za-z]", ""))).cast("double") / n
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") / n
    val toks = tokensCol(text)
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val stop = profileCount(toks, LangProfiles.head._2).cast("double") / nTok
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    round(lit(0.25) * lenScore + lit(0.35) * alpha +
      lit(0.25) * (lit(1.0) - least(punct * 10.0, lit(1.0))) + lit(0.15) * least(stop * 4.0, lit(1.0)), 4)
  }

  def qualityScore(text: String): Double = {
    val t = if (text == null) "" else text
    val n = math.max(t.length, 1).toDouble
    val alpha = t.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) / n
    val punct = t.count(".,;:!?".indexOf(_) >= 0) / n
    val toks = tokens(t)
    val nTok = math.max(toks.size, 1).toDouble
    val stop = toks.count(LangProfiles.head._2.contains) / nTok
    val lenScore = math.min(t.length / 500.0, 1.0)
    val raw = 0.25 * lenScore + 0.35 * alpha +
      0.25 * (1.0 - math.min(punct * 10.0, 1.0)) + 0.15 * math.min(stop * 4.0, 1.0)
    BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  // ----------------------------------------------------- fingerprinting ----
  /** 60-bit document fingerprint over whitespace-normalized lowercase text
    * — the exact-dedup key. */
  def fingerprintCol(text: Column): Column =
    hash60(regexp_replace(trim(lower(text)), "\\s+", " "))

  def fingerprint(text: String): Long =
    hash60(if (text == null) "" else text.trim.toLowerCase.replaceAll("\\s+", " "))

  // ------------------------------------------------- markdown stripping ----

  /** Markdown-source syntax in the order [[markdownStripCol]] removes it.
    * Each entry is (java-regex, replacement); the order is the contract
    * (images must strip before links, ** before *). Kept RE2-compatible
    * (no lookaround, no pattern backreferences) so an independent engine
    * can replay the chain. */
  val MarkdownRules: Seq[(String, String)] = Seq(
    "(?s)```.*?```" -> " ",                    // fenced code blocks dropped
    "`([^`\n]*)`" -> "$1",                     // inline code keeps content
    "!\\[([^\\]]*)\\]\\(([^)]*)\\)" -> "$1",   // image -> alt text
    "\\[([^\\]]*)\\]\\(([^)]*)\\)" -> "$1",    // link  -> anchor text
    "<https?://[^>]*>" -> " ",                 // autolinks dropped
    "(?m)^#{1,6}[ \t]+" -> "",                 // heading markers
    "(?m)^>[ \t]?" -> "",                      // blockquote markers
    "(?m)^[ \t]*([-*_][ \t]*){3,}$" -> " ",    // horizontal rules
    "(?m)^[ \t]*[-*+][ \t]+" -> "",            // bullet markers
    "(?m)^[ \t]*[0-9]+\\.[ \t]+" -> "",        // numbered-list markers
    "\\*\\*([^*]+)\\*\\*" -> "$1",             // bold
    "\\*([^*]+)\\*" -> "$1",                   // italic
    "__([^_]+)__" -> "$1",                     // bold (underscore form)
    "_([^_]+)_" -> "$1")                       // italic (underscore form)

  /** Markdown → flat prose text: README/doc corpora carry markup that
    * pollutes token statistics, dedup shingles, and LM training the same
    * way HTML tags do; this is the markdown twin of the DOM strip. Chained
    * `regexp_replace` ([[MarkdownRules]] in order, then whitespace
    * collapse + trim) — a codegen'd expression, zero shuffles. Known
    * limitation (documented, not guessed at): the underscore-emphasis
    * rules don't require word boundaries (RE2-compatibility forbids
    * lookaround), so `snake_case_names` lose their underscores; corpora
    * where that matters should drop those two rules. */
  def markdownStripCol(text: Column): Column = {
    val stripped = MarkdownRules.foldLeft(text) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    trim(regexp_replace(stripped, "\\s+", " "))
  }

  /** Pure twin of [[markdownStripCol]]. */
  def markdownStrip(text: String): String = {
    val s = if (text == null) "" else text
    val stripped = MarkdownRules.foldLeft(s) { case (t, (p, r)) =>
      t.replaceAll(p, r)
    }
    stripped.replaceAll("\\s+", " ").trim
  }

  // ------------------------------------------------- repetition signals ----
  /** Gopher-style repetition signals per document (the classic "remove
    * template-y pages" quality rules): duplicate-line ratio (fraction of
    * non-empty trimmed lines that repeat an earlier line) and top-bigram
    * ratio (occurrences of the most frequent word bigram over all bigram
    * occurrences). Relational shape — explode, two aggregations, one join;
    * no per-row quadratic work. Output: (id, n_lines, dup_line_ratio,
    * top_bigram_ratio), ratios 6dp; docs with <2 tokens score 0 bigram
    * ratio, docs with no non-empty lines are dropped (no signal). */
  def repetitionStatsDf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val lines = df
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__line"))
      .select(col(idCol),
        regexp_replace(col("__line"), "^\\s+|\\s+$", "").as("__line"))
      .filter(col("__line") =!= "")
    val lineStats = lines.groupBy(idCol).agg(
      count(lit(1)).as("n_lines"),
      countDistinct(col("__line")).as("__n_distinct"))
    val toksC = tokensCol(col(textCol))
    val bigrams = df.select(col(idCol),
      explode(when(size(toksC) < 2, array()).otherwise(
        transform(sequence(lit(0), size(toksC) - 2),
          i => concat_ws(" ", slice(toksC, i + 1, lit(2)))))).as("__bg"))
    val bgStats = bigrams.groupBy(idCol, "__bg").agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(max("__c").as("__top"), sum("__c").as("__total"))
    lineStats.join(bgStats, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        round((col("n_lines") - col("__n_distinct")).cast("double") /
          col("n_lines").cast("double"), 6).as("dup_line_ratio"),
        coalesce(round(col("__top").cast("double") / col("__total").cast("double"), 6),
          lit(0.0)).as("top_bigram_ratio"))
  }

  /** Pure twin of [[repetitionStatsDf]] for one document. */
  def repetitionStats(text: String): Option[(Long, Double, Double)] = {
    val lines = text.split("\n", -1).toSeq
      .map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)
    if (lines.isEmpty) return None
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dup = r6((lines.size - lines.distinct.size).toDouble / lines.size)
    val toks = tokens(text)
    val bgRatio =
      if (toks.size < 2) 0.0
      else {
        val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
        r6(bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size)
      }
    Some((lines.size.toLong, dup, bgRatio))
  }

  /** The full Gopher repetition battery (Rae et al. 2021, App. A1) beyond
    * [[repetitionStatsDf]]'s two headline signals: paragraph-level
    * duplication, CHARACTER-weighted duplication (a doc whose one huge
    * paragraph repeats is worse than one whose "Thanks!" line does), and
    * top n-gram character fractions for n = 2, 3, 4.
    *
    * Exact definitions (each engine-replayable, ratios 6dp):
    *  - paragraphs split on blank lines, lines on newlines; both trimmed,
    *    empties dropped; docs with no non-empty paragraph are dropped.
    *  - dup_para_ratio = (n_paras − n_distinct) / n_paras.
    *  - dup_para_char_ratio / dup_line_char_ratio = Σ c·len over values
    *    with count > 1, divided by Σ c·len over all values.
    *  - topN_char_ratio = c(top)·len(top) / len(ws-joined tokens), top =
    *    most frequent n-gram, ties to the lexicographically smallest;
    *    0 when the doc has < n tokens.
    *
    * Plan: per-(id, value) partial-agg groupBys (hot values combine
    * map-side) + per-doc windows for the three argmaxes — every key is
    * doc-bounded, so the shape holds at corpus scale. */
  def gopherStatsDf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window

    def valueStats(sep: String, prefix: String) = {
      val vals = df
        .select(col(idCol), explode(split(col(textCol), sep)).as("__v"))
        .select(col(idCol),
          regexp_replace(col("__v"), "^\\s+|\\s+$", "").as("__v"))
        .filter(col("__v") =!= "")
        .groupBy(col(idCol), col("__v")).agg(count(lit(1)).as("__c"))
      vals.groupBy(idCol).agg(
        sum("__c").as(s"${prefix}n"),
        count(lit(1)).as(s"${prefix}nd"),
        sum(col("__c") * length(col("__v"))).as(s"${prefix}chars"),
        sum(when(col("__c") > 1, col("__c") * length(col("__v")))
          .otherwise(lit(0L))).as(s"${prefix}dchars"))
    }
    val ps = valueStats("\n\\s*\n", "__p_")
    val ls = valueStats("\n", "__l_")

    val toksC = tokensCol(col(textCol))
    val base = df.select(col(idCol), toksC.as("__toks"))
      .withColumn("__doclen", length(concat_ws(" ", col("__toks"))))
    def topN(n: Int) = {
      val grams = base.select(col(idCol), col("__doclen"),
        explode(when(size(col("__toks")) < n, array()).otherwise(
          transform(sequence(lit(0), size(col("__toks")) - n),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n)))))).as("__g"))
      val counted = grams
        .groupBy(col(idCol), col("__doclen"), col("__g"))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__c").desc, col("__g").asc)
      counted.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(idCol),
          round(col("__c") * length(col("__g")) /
            col("__doclen").cast("double"), 6).as(s"top${n}_char_ratio"))
    }

    ps.join(ls, Seq(idCol))
      .join(topN(2), Seq(idCol), "left")
      .join(topN(3), Seq(idCol), "left")
      .join(topN(4), Seq(idCol), "left")
      .select(col(idCol),
        col("__p_n").as("n_paras"),
        round((col("__p_n") - col("__p_nd")).cast("double") /
          col("__p_n").cast("double"), 6).as("dup_para_ratio"),
        round(col("__p_dchars").cast("double") /
          col("__p_chars").cast("double"), 6).as("dup_para_char_ratio"),
        round(col("__l_dchars").cast("double") /
          col("__l_chars").cast("double"), 6).as("dup_line_char_ratio"),
        coalesce(col("top2_char_ratio"), lit(0.0)).as("top2_char_ratio"),
        coalesce(col("top3_char_ratio"), lit(0.0)).as("top3_char_ratio"),
        coalesce(col("top4_char_ratio"), lit(0.0)).as("top4_char_ratio"))
  }

  /** Pure twin of [[gopherStatsDf]] for one document:
    * (n_paras, dup_para_ratio, dup_para_char_ratio, dup_line_char_ratio,
    * top2, top3, top4 char ratios). None when no non-empty paragraph. */
  def gopherStats(text: String)
      : Option[(Long, Double, Double, Double, Double, Double, Double)] = {
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def vals(parts: Seq[String]) = parts.map(_.trim).filter(_.nonEmpty)
    val paras = vals(text.split("\n\\s*\n", -1).toSeq)
    if (paras.isEmpty) return None
    def charStats(vs: Seq[String]): (Double, Double) = {
      val groups = vs.groupBy(identity).values.map(g => (g.head, g.size)).toSeq
      val all = groups.map { case (v, c) => c.toLong * v.length }.sum
      val dup = groups.filter(_._2 > 1).map { case (v, c) => c.toLong * v.length }.sum
      (all.toDouble, dup.toDouble)
    }
    val (pAll, pDup) = charStats(paras)
    val lines = vals(text.split("\n", -1).toSeq)
    val (lAll, lDup) = charStats(lines)
    val toks = tokens(text)
    val docLen = toks.mkString(" ").length
    def top(n: Int): Double =
      if (toks.size < n) 0.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val (g, c) = grams.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (g, c) => (-c, g) }
        r6(c.toDouble * g.length / docLen)
      }
    Some((paras.size.toLong,
      r6((paras.size - paras.distinct.size).toDouble / paras.size),
      r6(pDup / pAll), r6(lDup / lAll), top(2), top(3), top(4)))
  }

  // ------------------------------------------------- gopher quality --------
  /** The Gopher quality-rule battery (Rae et al. 2021, A1.1) — the
    * deterministic subset, as INTEGER metrics with exact rational
    * thresholds (`10·symbols ≤ words` instead of `ratio ≤ 0.1`), so flags
    * are bit-identical in any engine with zero float rounding:
    *
    *  - word count in [50, 100000] (whitespace words);
    *  - mean word length in [3, 10] (non-whitespace chars / words);
    *  - (hash + ellipsis) symbols ≤ 0.1 per word;
    *  - ≤90% of lines bullet-started, ≤30% ellipsis-ended;
    *  - ≥80% of words contain an alphabetic character;
    *  - ≥2 distinct stop words from the 8-word list present.
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Integer metrics + per-rule flags + overall `kept`. */
  def gopherQualityDf(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = regexp_replace(col(textCol), "^\\s+|\\s+$", "")
    val bound = df.select(col(idCol), t.as("__t"),
      when(length(t) === 0, array()).otherwise(split(t, "\\s+")).as("__w"),
      filter(transform(split(col(textCol), "\n"),
        l => regexp_replace(l, "^\\s+|\\s+$", "")), l => l =!= "").as("__l"),
      tokensCol(col(textCol)).as("__k"))
    val m = bound.select(col(idCol),
      size(col("__w")).cast("long").as("n_words"),
      length(regexp_replace(col("__t"), "\\s+", "")).cast("long")
        .as("word_chars"),
      ((length(col("__t")) - length(replace(col("__t"), lit("#"), lit("")))) +
        size(regexp_extract_all(col("__t"), lit("\\.\\.\\."), lit(0))) +
        (length(col("__t")) -
          length(replace(col("__t"), lit("…"), lit(""))))).cast("long")
        .as("n_symbols"),
      size(col("__l")).cast("long").as("n_lines"),
      size(filter(col("__l"), l => startswith(l, lit("-")) ||
        startswith(l, lit("*")) || startswith(l, lit("•"))))
        .cast("long").as("n_bullet_lines"),
      size(filter(col("__l"), l => endswith(l, lit("...")) ||
        endswith(l, lit("…")))).cast("long").as("n_ellipsis_lines"),
      size(filter(col("__w"), w => w.rlike("[A-Za-z]"))).cast("long")
        .as("n_alpha_words"),
      GopherStopWords.map(w =>
        when(array_contains(col("__k"), w), 1L).otherwise(0L))
        .reduce(_ + _).as("n_stop"))
    m.select(col(idCol), col("n_words"), col("word_chars"), col("n_symbols"),
      col("n_lines"), col("n_bullet_lines"), col("n_ellipsis_lines"),
      col("n_alpha_words"), col("n_stop"),
      (col("n_words") >= 50 && col("n_words") <= 100000).as("f_word_count"),
      (col("word_chars") >= lit(3) * col("n_words") &&
        col("word_chars") <= lit(10) * col("n_words")).as("f_mean_len"),
      (lit(10) * col("n_symbols") <= col("n_words")).as("f_symbols"),
      (lit(10) * col("n_bullet_lines") <= lit(9) * col("n_lines"))
        .as("f_bullets"),
      (lit(10) * col("n_ellipsis_lines") <= lit(3) * col("n_lines"))
        .as("f_ellipsis"),
      (lit(5) * col("n_alpha_words") >= lit(4) * col("n_words"))
        .as("f_alpha"),
      (col("n_stop") >= 2).as("f_stop"))
      .withColumn("kept",
        col("f_word_count") && col("f_mean_len") && col("f_symbols") &&
          col("f_bullets") && col("f_ellipsis") && col("f_alpha") &&
          col("f_stop"))
  }

  /** Pure twin of [[gopherQualityDf]]: the 8 integer metrics in column
    * order, then the 7 flags + kept. */
  def gopherQuality(text: String)
      : (Seq[Long], Seq[Boolean]) = {
    val t = (if (text == null) "" else text).replaceAll("^\\s+|\\s+$", "")
    val words = if (t.isEmpty) Seq.empty[String] else t.split("\\s+").toSeq
    val lines = (if (text == null) "" else text).split("\n", -1).toSeq
      .map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)
    val toks = tokens(text)
    val nWords = words.size.toLong
    val wordChars = t.replaceAll("\\s+", "").length.toLong
    val nSymbols = t.count(_ == '#').toLong +
      "\\.\\.\\.".r.findAllMatchIn(t).size + t.count(_ == '…').toLong
    val nLines = lines.size.toLong
    val nBullet = lines.count(l => l.startsWith("-") || l.startsWith("*") ||
      l.startsWith("•")).toLong
    val nEllipsis = lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong
    val nAlpha = words.count(_.exists(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
    val nStop = GopherStopWords.count(toks.contains).toLong
    val flags = Seq(
      nWords >= 50 && nWords <= 100000,
      wordChars >= 3 * nWords && wordChars <= 10 * nWords,
      10 * nSymbols <= nWords,
      10 * nBullet <= 9 * nLines,
      10 * nEllipsis <= 3 * nLines,
      5 * nAlpha >= 4 * nWords,
      nStop >= 2)
    (Seq(nWords, wordChars, nSymbols, nLines, nBullet, nEllipsis, nAlpha,
      nStop), flags :+ flags.forall(identity))
  }

  // -------------------------------------------------- dehyphenation --------
  /** PDF/column line-break de-hyphenation: `exam-\nple` → `example`. The
    * classic text-layer extraction artifact repair. Conservative rule:
    * join only letter + `-` + line break (+ indent) + LOWERCASE letter —
    * a capitalized continuation is likelier a real compound or a new
    * sentence and is left alone, as are intra-line hyphens
    * (`state-of-the-art`). Zero-shuffle narrow projection. */
  val DehyphenRe = "([A-Za-z])-\\s*\\n\\s*([a-z])"

  def dehyphenateCol(text: Column): Column =
    regexp_replace(text, DehyphenRe, "$1$2")

  /** Pure twin of [[dehyphenateCol]]. */
  def dehyphenate(text: String): String =
    if (text == null) null else text.replaceAll(DehyphenRe, "$1$2")

  // ---------------------------------------------------- script mix ---------
  /** Unicode script ranges for mixed-script detection — the cheap signal
    * for encoding damage, spam keyword stuffing, and wrong-language
    * routing before the heavier language-ID stage. Ranges are the BMP
    * blocks that dominate web text; everything is a plain character-class
    * count, so any engine replays it exactly. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "digit" -> "0-9",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}",
    "hangul" -> "\\x{AC00}-\\x{D7AF}",
    "kana" -> "\\x{3040}-\\x{30FF}")

  /** Per-script character counts plus the dominant script (max count, ties
    * to [[ScriptRanges]] order; "none" when all counts are zero). Returns
    * the columns in table order followed by `dominant`. */
  def scriptMixCols(text: Column): Seq[Column] = {
    val counts = ScriptRanges.map { case (name, range) =>
      (length(text) - length(regexp_replace(text, s"[$range]", "")))
        .cast("long").as(s"n_$name")
    }
    val raw = ScriptRanges.map { case (name, range) =>
      name -> (length(text) - length(regexp_replace(text, s"[$range]", "")))
    }
    val mx = greatest(raw.map(_._2): _*)
    // first-listed script achieving the max wins ties (chained when in
    // table order); all-zero → "none"
    val dominant = when(mx === 0, lit("none")).otherwise(
      raw.reverse.foldLeft(lit("none")) { case (acc, (name, c)) =>
        when(c === mx, lit(name)).otherwise(acc)
      })
    counts :+ dominant.as("dominant")
  }

  /** Pure twin of [[scriptMixCols]]: counts in table order + dominant. */
  def scriptMix(text: String): (Seq[Long], String) = {
    val t = if (text == null) "" else text
    def inRange(c: Char, range: String): Boolean = range match {
      case "A-Za-z" => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
      case "0-9" => c >= '0' && c <= '9'
      case r =>
        val m = "\\\\x\\{([0-9A-Fa-f]+)\\}-\\\\x\\{([0-9A-Fa-f]+)\\}".r
          .findFirstMatchIn(r).get
        c >= Integer.parseInt(m.group(1), 16) &&
          c <= Integer.parseInt(m.group(2), 16)
    }
    val counts = ScriptRanges.map { case (_, r) =>
      t.count(inRange(_, r)).toLong
    }
    val dominant =
      if (counts.forall(_ == 0)) "none"
      else ScriptRanges(counts.indexOf(counts.max))._1
    (counts, dominant)
  }

  // ------------------------------------------------ paragraph dedup --------
  /** Within-document paragraph de-templating: keep the FIRST occurrence of
    * each exact trimmed paragraph, drop repeats — the removal counterpart
    * to [[gopherStatsDf]]'s duplicate-paragraph measurement (headers,
    * nav blocks, and legal footers pasted repeatedly into one page).
    * Paragraphs split on blank lines, whitespace-trimmed, empties dropped;
    * output preserves original order with a canonical blank-line joiner.
    *
    * Plan: zero-shuffle narrow projection. The paragraph array is bound to
    * a named column BEFORE the index-filter references it twice (the
    * interpreted-HOF inlining trap: an inlined expression re-evaluates per
    * element), and first-occurrence is `array_position(paras, p) == i+1` —
    * O(p²) character compares per doc, bounded by paragraph count, never
    * leaving the row. */
  def dedupParagraphsDf(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val paras = filter(transform(split(col(textCol), "\n\\s*\n"),
      p => regexp_replace(p, "^\\s+|\\s+$", "")), p => p =!= "")
    df.select(col(idCol), paras.as("__paras"))
      .select(col(idCol), col("__paras"),
        filter(col("__paras"), (p, i) =>
          array_position(col("__paras"), p) === (i + 1).cast("long"))
          .as("__kept"))
      .select(col(idCol),
        concat_ws("\n\n", col("__kept")).as("clean_text"),
        size(col("__paras")).cast("long").as("n_paras"),
        (size(col("__paras")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** Pure twin of [[dedupParagraphsDf]]:
    * (clean_text, n_paras, n_removed). */
  def dedupParagraphs(text: String): (String, Long, Long) = {
    val paras = text.split("\n\\s*\n", -1).toSeq
      .map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)
    val kept = paras.zipWithIndex
      .filter { case (p, i) => paras.indexOf(p) == i }.map(_._1)
    (kept.mkString("\n\n"), paras.size.toLong, (paras.size - kept.size).toLong)
  }

  // ----------------------------------------------------------- PII ---------
  /** PII patterns for training-corpus scrubbing. Kept in the common subset
    * of Java regex and RE2 (no lookaround, no backreferences) so DuckDB
    * replays redaction and counts byte-for-byte. SSN is scrubbed before
    * phone: the two shapes are disjoint (3-2-4 vs 3-3-4) but ordering makes
    * the composition deterministic by construction, not by accident. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\(\\d{3}\\)\\s*\\d{3}[-.]\\d{4}|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redacted text: SSN → [SSN], phone → [PHONE], email → [EMAIL]. */
  def scrubPiiCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, SsnRe, "[SSN]"),
        PhoneRe, "[PHONE]"),
      EmailRe, "[EMAIL]")

  /** Per-class PII hit counts: (emails, phones, ssns) — counted on the raw
    * text (phone counts are over the SSN-scrubbed text in [[scrubPiiCol]]'s
    * composition, but the disjoint shapes make raw counts identical). */
  def piiCountsCol(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
      regexp_count(text, lit(PhoneRe)),
      regexp_count(text, lit(SsnRe)))

  /** Pure twin of [[scrubPiiCol]]. */
  def scrubPii(text: String): String =
    text.replaceAll(SsnRe, "[SSN]")
      .replaceAll(PhoneRe, "[PHONE]")
      .replaceAll(EmailRe, "[EMAIL]")

  /** Pure twin of [[piiCountsCol]]. */
  def piiCounts(text: String): (Int, Int, Int) = {
    def n(re: String) = re.r.findAllMatchIn(text).size
    (n(EmailRe), n(PhoneRe), n(SsnRe))
  }

  // ------------------------------------------------ payment-card scrub ----

  /** Card-number candidates: 13-19 digits with optional single space/dash
    * separators, word-bounded. Presence alone is NOT redaction-worthy —
    * order ids and serial numbers look exactly like this — so candidates
    * are Luhn-checked and only VALID numbers are replaced. */
  val CardRe = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Luhn checksum over a digit string (ISO/IEC 7812): double every second
    * digit from the right, subtract 9 above 9, sum % 10 == 0. */
  def luhnValid(digits: String): Boolean =
    digits.length >= 13 && digits.length <= 19 && {
      var sum = 0
      var dbl = false
      var i = digits.length - 1
      while (i >= 0) {
        var d = digits.charAt(i) - '0'
        if (dbl) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        dbl = !dbl
        i -= 1
      }
      sum % 10 == 0
    }

  /** Scrub Luhn-valid card numbers from `text`: (cleaned, nCandidates,
    * nValid). Candidates that fail the checksum stay verbatim — they are
    * data, not PII. Pure kernel; [[ccScrubDf]] is the distributed twin. */
  def ccScrub(text: String): (String, Int, Int) = {
    val s = if (text == null) "" else text
    var cands = 0
    var valid = 0
    val out = CardRe.r.replaceAllIn(s, m => {
      cands += 1
      val digits = m.matched.filter(_.isDigit)
      if (luhnValid(digits)) { valid += 1; "[CARD]" }
      else java.util.regex.Matcher.quoteReplacement(m.matched)
    })
    (out, cands, valid)
  }

  /** One row per input row: (idCol, clean, n_candidates, n_valid). Typed
    * mapPartitions — narrow, zero shuffles (the conditional per-match
    * replacement has no regexp_replace form). */
  def ccScrubDf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = true),
      StructField("clean", StringType, nullable = false),
      StructField("n_candidates", LongType, nullable = false),
      StructField("n_valid", LongType, nullable = false)))
    df.select(col(idCol).cast("string").as("id"), col(textCol).as("__t"))
      .mapPartitions { it =>
        it.map { r =>
          val (c, n, v) = ccScrub(if (r.isNullAt(1)) "" else r.getString(1))
          org.apache.spark.sql.Row(r.getString(0), c, n.toLong, v.toLong)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      .withColumnRenamed("id", idCol)
  }

  // -------------------------------------------------------- mojibake -------
  /** UTF-8 bytes mis-decoded as Windows-1252 — the dominant encoding defect
    * in web corpora ("Ã©" where "é" was meant). Each entry maps the
    * mis-decoded character sequence back to the intended character; the
    * table covers the Latin-1 accents and Win-1252 punctuation that
    * dominate real crawls. The repair is the FIXED-ORDER composition of one
    * literal replacement pass per entry (no entry is a prefix of another,
    * and entries are generated mechanically: bad = utf8(good) decoded as
    * cp1252) — both engines replay the identical chain, so parity holds
    * even on adversarial inputs where one repair splices a later pattern. */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "\u00e2\u20ac\u2122" -> "\u2019", // right single quote
    "\u00e2\u20ac\u02dc" -> "\u2018", // left single quote
    "\u00e2\u20ac\u0153" -> "\u201c", // left double quote
    "\u00e2\u20ac\u201c" -> "\u2013", // en dash
    "\u00e2\u20ac\u201d" -> "\u2014", // em dash
    "\u00e2\u20ac\u00a6" -> "\u2026", // ellipsis
    // Latin-1 accents and symbols: C3/C2 xx read cp1252
    "\u00c3\u00a9" -> "\u00e9", // e acute
    "\u00c3\u00a8" -> "\u00e8", // e grave
    "\u00c3\u00aa" -> "\u00ea", // e circumflex
    "\u00c3\u00a1" -> "\u00e1", // a acute
    "\u00c3\u00a4" -> "\u00e4", // a umlaut
    "\u00c3\u00b6" -> "\u00f6", // o umlaut
    "\u00c3\u00bc" -> "\u00fc", // u umlaut
    "\u00c3\u00b3" -> "\u00f3", // o acute
    "\u00c3\u00ba" -> "\u00fa", // u acute
    "\u00c3\u00b1" -> "\u00f1", // n tilde
    "\u00c3\u00a7" -> "\u00e7", // c cedilla
    "\u00c2\u00ab" -> "\u00ab", // left guillemet
    "\u00c2\u00bb" -> "\u00bb", // right guillemet
    "\u00c2\u00b0" -> "\u00b0", // degree
    "\u00c2\u00a9" -> "\u00a9", // copyright
    "\u00c2\u00ae" -> "\u00ae") // registered

  /** Repaired text: every [[MojibakeTable]] sequence replaced. Literal
    * `replace`, not regex \u2014 zero-shuffle narrow projection. */
  def fixMojibakeCol(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** Pure twin of [[fixMojibakeCol]]. */
  def fixMojibake(text: String): String =
    MojibakeTable.foldLeft(text) { case (t, (bad, good)) =>
      t.replace(bad, good)
    }

  // ----------------------------------------------------- unicode fold ------
  /** ASCII folding for match/dedup keys — "Café" ≡ "Cafe", fullwidth
    * "ＡＢＣ" ≡ "ABC": the normalization pass applied before fingerprinting
    * multilingual crawls so transport-level variants of the same string
    * dedup together.
    *
    * The fold is DATA, not a per-row library call: the 1:1 table is
    * generated ONCE at class load (Latin-1 Supplement + Latin Extended-A
    * letters to their NFD base via java.text.Normalizer, fullwidth ASCII
    * shifted down by 0xFEE0, plus the non-decomposing letters Ø/Đ/Ł/ı
    * pinned explicitly) and applied with one `translate`; the multi-char
    * ligatures (Æ, Œ, ß, Þ, Ð) take a fixed literal replace chain first.
    * The oracle embeds the SAME generated literals, so no engine-side
    * Unicode library is ever consulted at query time. */
  val FoldMulti: Seq[(String, String)] = Seq(
    "Æ" -> "AE", "æ" -> "ae", // Æ æ
    "Œ" -> "OE", "œ" -> "oe", // Œ œ
    "ß" -> "ss",                   // ß
    "Þ" -> "TH", "þ" -> "th", // Þ þ
    "Ð" -> "D", "ð" -> "d")   // Ð ð

  /** (from, to) strings for the 1:1 `translate` pass. */
  val (foldFrom: String, foldTo: String) = {
    val f = new StringBuilder
    val t = new StringBuilder
    for (c <- 0xFF01 to 0xFF5E) { f.append(c.toChar); t.append((c - 0xFEE0).toChar) }
    f.append('　'); t.append(' ') // ideographic space
    val multi = FoldMulti.map(_._1.charAt(0)).toSet
    for (ci <- 0xC0 to 0x17F; ch = ci.toChar if ch.isLetter && !multi(ch)) {
      val d = java.text.Normalizer.normalize(ch.toString, java.text.Normalizer.Form.NFD)
      val base = d.charAt(0)
      if (base < 128 && base.isLetter && d.replaceAll("\\p{M}", "").length == 1) {
        f.append(ch); t.append(base)
      }
    }
    // non-decomposing Latin letters NFD cannot reach
    for ((a, b) <- Seq('Ø' -> 'O', 'ø' -> 'o', 'Đ' -> 'D',
        'đ' -> 'd', 'Ł' -> 'L', 'ł' -> 'l', 'ı' -> 'i')) {
      f.append(a); t.append(b)
    }
    (f.toString, t.toString)
  }

  /** Folded text: ligature replace chain, then one translate. */
  def foldAsciiCol(text: Column): Column =
    translate(FoldMulti.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }, foldFrom, foldTo)

  /** Pure twin of [[foldAsciiCol]]. */
  def foldAscii(text: String): String = {
    val multi = FoldMulti.foldLeft(text) { case (s, (bad, good)) =>
      s.replace(bad, good)
    }
    val map = foldFrom.zip(foldTo).toMap
    multi.map(c => map.getOrElse(c, c))
  }

  // ------------------------------------------- confusable-char scrubbing ---

  /** Invisible / zero-width characters that obfuscated spam hides behind
    * (word-splitting defeats keyword filters while rendering unchanged):
    * ZWSP, ZWNJ, ZWJ, word joiner, BOM-as-ZWNBSP, soft hyphen. */
  val InvisibleChars = "\u200B\u200C\u200D\u2060\uFEFF\u00AD"

  /** Cyrillic and Greek letters visually identical to Latin ones — the
    * classic homoglyph-substitution trick ("sаle" with U+0430). Single
    * BMP chars only, so one `translate` pass maps them all. */
  val HomoglyphPairs: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase / uppercase
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p',
    'с' -> 'c', 'у' -> 'y', 'х' -> 'x', 'і' -> 'i',
    'ѕ' -> 's', 'ј' -> 'j',
    'А' -> 'A', 'В' -> 'B', 'Е' -> 'E', 'К' -> 'K',
    'М' -> 'M', 'Н' -> 'H', 'О' -> 'O', 'Р' -> 'P',
    'С' -> 'C', 'Т' -> 'T', 'Х' -> 'X',
    // Greek lowercase / uppercase
    'ο' -> 'o', 'ν' -> 'v',
    'Α' -> 'A', 'Β' -> 'B', 'Ε' -> 'E', 'Ζ' -> 'Z',
    'Η' -> 'H', 'Ι' -> 'I', 'Κ' -> 'K', 'Μ' -> 'M',
    'Ν' -> 'N', 'Ο' -> 'O', 'Ρ' -> 'P', 'Τ' -> 'T',
    'Υ' -> 'Y', 'Χ' -> 'X')

  private val homoFrom = HomoglyphPairs.map(_._1).mkString
  private val homoTo = HomoglyphPairs.map(_._2).mkString
  private val invisibleRe = s"[$InvisibleChars]"
  private val homoRe = s"[$homoFrom]"

  /** Scrubbed text: invisibles deleted, homoglyphs mapped to their Latin
    * look-alikes. Codegen'd (one regexp_replace + one translate), zero
    * shuffles. Run BEFORE keyword filters, blocklists, and dedup
    * shingling — the whole point of the obfuscation is to defeat them. */
  def confusableScrubCol(text: Column): Column =
    translate(regexp_replace(text, invisibleRe, ""), homoFrom, homoTo)

  /** Detection counts (n_invisible, n_homoglyph) — a page with many hits
    * is adversarial, not multilingual: genuine Cyrillic text uses the
    * WHOLE alphabet, not just the Latin-lookalike subset. */
  def confusableCountsCol(text: Column): (Column, Column) =
    (regexp_count(text, lit(invisibleRe)), regexp_count(text, lit(homoRe)))

  /** Pure twin of [[confusableScrubCol]]. */
  def confusableScrub(text: String): String = {
    val map = HomoglyphPairs.toMap
    val s = if (text == null) "" else text
    s.filterNot(InvisibleChars.contains(_)).map(c => map.getOrElse(c, c))
  }

  /** Pure twin of [[confusableCountsCol]]. */
  def confusableCounts(text: String): (Int, Int) = {
    val s = if (text == null) "" else text
    (s.count(InvisibleChars.contains(_)), s.count(homoFrom.contains(_)))
  }

  // ------------------------------------------------------- vocabulary ------
  /** Corpus-wide top-k token vocabulary with frequencies, ties broken by
    * token text so the cut is deterministic. The plan is the one you want
    * at scale: explode → partial (map-side) count → final count →
    * TakeOrderedAndProject, i.e. each partition ships only its local top-k
    * candidates' counts, never a global sort. */
  /** Character-level Shannon entropy as a quality signal — the
    * compressibility heuristic: near-zero entropy flags repeated-char /
    * template boilerplate, entropy near the alphabet ceiling flags
    * random-byte gibberish, prose sits in between (~2.0-3.3 nats for
    * English). H = ln(n) − (Σ cᵢ·ln(cᵢ))/n over the per-doc char
    * histogram, carried in micro-nats with ONE rounded ln per distinct
    * (doc, char) count so the number replays bit-identically in any
    * engine (the [[graft.text.Importance]] integer-log idiom).
    *
    * Plan: explode to (id, char) rows, ONE partial-agg groupBy pair —
    * map-side combine collapses the per-char rows before the exchange, so
    * the shuffle carries ≤ |alphabet| rows per doc. Splitting is by Java
    * char (UTF-16 unit): astral-plane code points count as two units —
    * fine for a rate signal, documented rather than hidden.
    *
    * Output: (id, n_chars, n_distinct, entropy_micro); empty docs get
    * entropy 0 (not null — a zero-length doc IS maximally compressible).
    */
  def charEntropyDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lnMicro = (c: Column) => round(log(c.cast("double")) * 1e6).cast("long")
    df.select(col(idCol), explode(split(col(textCol), "")).as("__ch"))
      // Java split(re, -1) emits a trailing "" element; DuckDB's
      // string_split does not — drop it on this side so the count replays
      .filter(col("__ch") =!= "")
      .groupBy(col(idCol), col("__ch")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_chars"),
        count(lit(1)).as("n_distinct"),
        sum(col("__c") * lnMicro(col("__c"))).as("__sum_cl"))
      .join(df.select(col(idCol)), Seq(idCol), "right_outer")
      .select(col(idCol),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(coalesce(col("n_chars"), lit(0L)) === 0, lit(0L))
          .otherwise(lnMicro(col("n_chars")) -
            expr("__sum_cl div n_chars")).as("entropy_micro"))
  }

  /** Pure twin of [[charEntropyDf]] for one document. */
  def charEntropy(text: String): (Long, Long, Long) = {
    if (text.isEmpty) return (0L, 0L, 0L)
    val hist = text.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def lnMicro(x: Long) = Math.round(Math.log(x.toDouble) * 1e6)
    val n = text.length.toLong
    val sumCl = hist.values.map(c => c * lnMicro(c)).sum
    (n, hist.size.toLong, lnMicro(n) - sumCl / n)
  }

  def topTokensDf(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(explode(tokensCol(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
  }

  // ------------------------------------------------ n-gram diversity -------
  /** Word n-grams of `toks` joined with single spaces; empty when the
    * document is shorter than n. The `when` guard matters: Spark's
    * `sequence(0, -1)` infers a DESCENDING step and returns [0, -1]
    * instead of an empty array. */
  def ngramsCol(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1: $n")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array())
  }

  /** distinct-n diversity (Li et al. 2016): per corpus slice and n-gram
    * order, total n-grams, distinct n-grams, and the distinct fraction in
    * integer milli. Low distinct-2/3 flags templated or model-generated
    * text; the metric is the standard per-slice QA gate before a corpus
    * (or a synthetic-data batch) is admitted to training.
    *
    * Shape at scale: narrow n-gram construction, then ONE partial-agg
    * (slice, n, gram) groupBy followed by a bounded-key (slice, n)
    * aggregate — the big shuffle carries each distinct gram once per map
    * partition, never the corpus. Slices with zero tokens emit nothing
    * (explode of an empty array). */
  def distinctNgramStats(df: DataFrame, sliceCol: String, textCol: String,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram orders: $ns")
    require(ns.distinct.size == ns.size, s"duplicate orders: $ns")
    // all orders built from ONE tokenization in ONE scan (a per-order
    // union would re-read the table once per n at 100 TB)
    val grams = ns.map { n =>
      transform(ngramsCol(col("__toks"), n),
        g => struct(lit(n.toLong).as("n"), g.as("gram")))
    }
    df.withColumn("__toks", tokensCol(col(textCol)))
      .select(col(sliceCol).as("slice"),
        explode(flatten(array(grams: _*))).as("__p"))
      .select(col("slice"), col("__p.n").as("n"), col("__p.gram").as("gram"))
      .groupBy("slice", "n", "gram").agg(count(lit(1)).as("__c"))
      .groupBy("slice", "n")
      .agg(sum("__c").as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("distinct_milli",
        expr("1000 * distinct_ngrams div total_ngrams"))
  }

  /** Tokenizer / vocabulary coverage per corpus slice — the OOV-rate
    * report every tokenizer swap ships with: per slice, total tokens,
    * tokens outside `vocabDf` (one `token` string column), and the OOV
    * fraction in integer milli.
    *
    * Shape at scale: explode → BROADCAST left join on the vocab (a vocab
    * is ≤ a few hundred thousand rows — always the small side) → ONE
    * partial-agg groupBy on the slice key. The corpus never shuffles by
    * token; the only exchange carries one row per slice per map partition. */
  def oovStats(df: DataFrame, sliceCol: String, textCol: String,
      vocabDf: DataFrame): DataFrame = {
    require(vocabDf.columns.contains("token"), "vocabDf needs a token column")
    val vocab = broadcast(vocabDf.select(col("token")).distinct()
      .withColumn("__in_vocab", lit(1L)))
    df.select(col(sliceCol).as("slice"),
        explode(tokensCol(col(textCol))).as("token"))
      .join(vocab, Seq("token"), "left")
      .groupBy("slice")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_milli", expr("1000 * n_oov div n_tokens"))
  }

  /** Pure twin of [[oovStats]] for one slice. */
  def oovStatsPure(texts: Seq[String], vocab: Set[String]): (Long, Long, Long) = {
    val toks = texts.flatMap(tokens)
    if (toks.isEmpty) (0L, 0L, 0L)
    else {
      val oov = toks.count(t => !vocab(t)).toLong
      (toks.size.toLong, oov, 1000L * oov / toks.size)
    }
  }

  /** Pure twin of [[distinctNgramStats]] for one slice and one n. */
  def distinctNgramStatsPure(texts: Seq[String], n: Int): (Long, Long, Long) = {
    val grams = texts.flatMap(t => tokens(t).sliding(n).filter(_.size == n)
      .map(_.mkString(" ")))
    if (grams.isEmpty) (0L, 0L, 0L)
    else {
      val total = grams.size.toLong
      val dist = grams.distinct.size.toLong
      (total, dist, 1000L * dist / total)
    }
  }

  /** PMI collocation mining — the classic corpus-analysis signal for
    * multiword expressions (Church & Hanks 1990): for adjacent token
    * pairs, PMI = ln P(a,b) − ln P(a) − ln P(b) with bigram probability
    * over the bigram total and unigram probabilities over the token
    * total, in exact integer micro-nats (the lnMicro idiom):
    *
    *   pmi_micro = ln(c_ab) − ln(N_bi) − ln(c_a) − ln(c_b) + 2·ln(N_uni)
    *
    * `minCount` guards the low-frequency PMI explosion; output is the
    * top-k by (pmi desc, w1, w2).
    *
    * Shape at scale: the corpus is scanned ONCE — unigram and bigram
    * entries flatten into one explode and ONE (kind, w1, w2) partial-agg
    * groupBy; every later join/aggregate runs on the vocab-bounded count
    * table, and the top-k is a TakeOrdered. */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long,
      topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1, s"bad args: $minCount/$topK")
    val lnM = (c: Column) => round(log(c.cast("double")) * 1e6).cast("long")
    val toks = col("__toks")
    val uniE = transform(toks, t => struct(lit("u").as("kind"),
      t.as("w1"), lit("").as("w2")))
    val biE = when(size(toks) >= 2, transform(sequence(lit(0), size(toks) - 2),
      i => struct(lit("b").as("kind"), element_at(toks, i + 1).as("w1"),
        element_at(toks, i + 2).as("w2"))))
      .otherwise(expr("array()").cast("array<struct<kind:string,w1:string,w2:string>>"))
    val counts = df.withColumn("__toks", tokensCol(col(textCol)))
      .select(explode(concat(uniE, biE)).as("__e"))
      .groupBy(col("__e.kind").as("kind"), col("__e.w1").as("w1"),
        col("__e.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val uni = counts.filter(col("kind") === "u").select(col("w1"), col("c"))
    val bi = counts.filter(col("kind") === "b")
      .select(col("w1"), col("w2"), col("c").as("c_ab"))
    val totU = uni.agg(sum("c").as("n_uni"))
    val totB = bi.agg(sum("c_ab").as("n_bi"))
    bi.filter(col("c_ab") >= minCount)
      .join(uni.select(col("w1"), col("c").as("__ca")), "w1")
      .join(uni.select(col("w1").as("w2"), col("c").as("__cb")), "w2")
      .join(broadcast(totU)).join(broadcast(totB))
      .withColumn("pmi_micro",
        lnM(col("c_ab")) - lnM(col("n_bi")) - lnM(col("__ca")) -
          lnM(col("__cb")) + lit(2L) * lnM(col("n_uni")))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
      .select("w1", "w2", "c_ab", "pmi_micro")
  }

  /** Pure twin of [[pmiCollocations]]. */
  def pmiCollocationsPure(texts: Seq[String], minCount: Long, topK: Int)
      : Seq[(String, String, Long, Long)] = {
    def lnM(x: Long) = Math.round(Math.log(x.toDouble) * 1e6)
    val tokss = texts.map(tokens)
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val bis = tokss.flatMap(ts => ts.zip(ts.drop(1)))
    val bi = bis.groupBy(identity).view.mapValues(_.size.toLong)
    val nU = uni.values.sum
    val nB = bis.size.toLong
    bi.toSeq.filter(_._2 >= minCount).map { case ((a, b), c) =>
      (a, b, c, lnM(c) - lnM(nB) - lnM(uni(a)) - lnM(uni(b)) + 2L * lnM(nU))
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(topK)
  }

  // ------------------------------------------------------ readability ------
  /** Heuristic syllable count for one lowercased token: vowel-group runs
    * (`[aeiouy]+`), minus one for a silent trailing 'e' (but not '-le',
    * and never below the run count of 1 — "the" is one syllable, "table"
    * two, a vowel-less token like "123" or "xyz" floors at 1). The
    * classic dictionary-free approximation every readability formula
    * implementation ships. */
  def syllablesCol(word: Column): Column = {
    val runs = size(regexp_extract_all(word, lit("[aeiouy]+"), lit(0)))
    val silentE = runs > 1 && word.endsWith("e") && !word.endsWith("le")
    greatest(when(silentE, runs - 1).otherwise(runs), lit(1))
  }

  def syllables(word: String): Int = {
    val m = java.util.regex.Pattern.compile("[aeiouy]+").matcher(word)
    var runs = 0
    while (m.find()) runs += 1
    val silentE = runs > 1 && word.endsWith("e") && !word.endsWith("le")
    math.max(if (silentE) runs - 1 else runs, 1)
  }

  /** Flesch reading-ease + Flesch–Kincaid grade per document, in exact
    * integer milli (Flesch 1948 / Kincaid et al. 1975 — the standard
    * cheap readability tier of a quality-filter battery; a corpus slice
    * whose median ease collapses is OCR noise or templated jargon, and
    * grade level is the usual curriculum/difficulty bucketing key):
    *
    *   ease_milli  = 206835 − 1015·wps_milli div 1000 − 84600·spw_milli div 1000
    *   grade_milli =  390·wps_milli div 1000 + 11800·spw_milli div 1000 − 15590
    *
    * with wps_milli = 1000·words div max(sentences,1) and spw_milli =
    * 1000·syllables div words. Sentences = non-blank `[.!?]+` segments;
    * words = the shared [[tokensCol]] tokenizer; syllables via
    * [[syllablesCol]]. Wordless documents emit NULL scores (0 would fake
    * "unreadably hard" for empty text).
    *
    * Shape at scale: completely NARROW — one projection of codegen'd
    * array math per row, no explode, no shuffle at any corpus size. */
  def readabilityDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null-safe: size(split(null)) is -1, not 0 — treat null as empty
    val text = coalesce(col(textCol), lit(""))
    val toks = tokensCol(text)
    val sentences = size(filter(split(text, "[.!?]+"),
      s => regexp_replace(s, "^\\s+|\\s+$", "") =!= ""))
    val sylls = aggregate(transform(toks, syllablesCol(_).cast("long")),
      lit(0L), (acc, x) => acc + x)
    df.select(col(idCol),
        sentences.cast("long").as("n_sentences"),
        size(toks).cast("long").as("n_words"),
        sylls.as("n_syllables"))
      .withColumn("__wps_milli",
        expr("1000 * n_words div greatest(n_sentences, 1L)"))
      .withColumn("__spw_milli",
        when(col("n_words") === 0, lit(null).cast("long"))
          .otherwise(expr("1000 * n_syllables div n_words")))
      .select(col(idCol), col("n_sentences"), col("n_words"),
        col("n_syllables"),
        (lit(206835L) - expr("1015 * __wps_milli div 1000") -
          expr("84600 * __spw_milli div 1000")).as("ease_milli"),
        (expr("390 * __wps_milli div 1000") +
          expr("11800 * __spw_milli div 1000") - lit(15590L))
          .as("grade_milli"))
  }

  // ------------------------------------------------- slice-level stats -----
  /** Tokenizer-efficiency datasheet per corpus slice: UTF-8 bytes,
    * whitespace tokens, BPE-ish pre-tokens, and bytes-per-token in
    * integer milli for both token rules. Bytes/token is THE tokenizer
    * comparison metric (a tokenizer swap that drops bytes/token 10%
    * cuts training FLOPs 10% at fixed data); the ws/bpe pair also flags
    * slices whose scripts the pre-tokenizer shreds (bpe ≫ ws tokens).
    *
    * Shape at scale: ONE partial-agg groupBy on the slice key — byte and
    * token sums combine map-side, the corpus never shuffles. */
  def tokenEfficiencyStats(df: DataFrame, sliceCol: String,
      textCol: String): DataFrame = {
    df.groupBy(col(sliceCol).as("slice"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col(textCol))).cast("long").as("total_bytes"),
        sum(wsTokenCountCol(col(textCol))).cast("long").as("ws_tokens"),
        sum(bpeTokenCountCol(col(textCol))).cast("long").as("bpe_tokens"))
      .withColumn("bytes_per_ws_milli",
        when(col("ws_tokens") === 0, lit(null).cast("long"))
          .otherwise(expr("1000 * total_bytes div ws_tokens")))
      .withColumn("bytes_per_bpe_milli",
        when(col("bpe_tokens") === 0, lit(null).cast("long"))
          .otherwise(expr("1000 * total_bytes div bpe_tokens")))
  }

  /** Pure twin of [[tokenEfficiencyStats]] for one slice. */
  def tokenEfficiencyPure(texts: Seq[String])
      : (Long, Long, Long, Long, Option[Long], Option[Long]) = {
    val bytes = texts.map(_.getBytes("UTF-8").length.toLong).sum
    val ws = texts.map(wsTokenCount(_).toLong).sum
    val bpe = texts.map(bpeTokenCount(_).toLong).sum
    (texts.size.toLong, bytes, ws, bpe,
      if (ws == 0) None else Some(1000L * bytes / ws),
      if (bpe == 0) None else Some(1000L * bytes / bpe))
  }

  /** Wilson score lower bound (z = 1.96) on a per-slice "good document"
    * rate, in integer milli — the evidence-aware domain-quality ranking:
    * 4/5 good docs and 4000/5000 good docs share p̂ = 800 milli, but the
    * latter's lower bound is far higher, so capping/boosting decisions
    * keyed on the BOUND stop rewarding tiny lucky domains (the standard
    * Wilson-interval ranking fix, Agresti & Coull 1998 / the classic
    * "how not to sort by average rating" correction).
    *
    * Exact integer evaluation of the closed form
    *   (k + z²/2 − z·√(k(n−k)/n + z²/4)) / (n + z²)
    * in micro units: the k(n−k)/n term splits into quotient and
    * remainder so nothing overflows below n ≈ 6·10⁹ docs per slice
    * (beyond that, pre-sample the slice — a single registrable domain
    * holding 6B+ docs is already capped by every upstream sampler).
    * √ is floor(IEEE sqrt) — correctly rounded in every engine, so the
    * floor replays bit-identically. Constants: z² = 3.8416 → 3841600
    * micro (halved/quartered exactly); the denominator rounds z²·1000 to
    * 3842 (documented ≈0.4-milli bias, deterministic everywhere).
    *
    * Shape at scale: ONE partial-agg groupBy + a narrow projection. */
  def sliceQualityWilson(df: DataFrame, sliceCol: String,
      goodCol: String): DataFrame = {
    df.groupBy(col(sliceCol).as("slice"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(goodCol), 1L).otherwise(0L)).as("n_good"))
      .withColumn("good_milli", expr("1000 * n_good div n_docs"))
      .withColumn("__prod", expr("n_good * (n_docs - n_good)"))
      .withColumn("__v_micro", expr(
        "(__prod div n_docs) * 1000000 + " +
          "(__prod % n_docs) * 1000000 div n_docs + 960400"))
      .withColumn("wilson_lower_milli", expr(
        "greatest((n_good * 1000000 + 1920800 - " +
          "1960 * cast(floor(sqrt(cast(__v_micro as double))) as bigint))" +
          " div (n_docs * 1000 + 3842), 0)"))
      .select("slice", "n_docs", "n_good", "good_milli",
        "wilson_lower_milli")
  }

  /** Pure twin of the Wilson bound for one (k, n) cell. */
  def wilsonLowerMilli(k: Long, n: Long): Long = {
    require(n > 0 && k >= 0 && k <= n, s"bad cell: k=$k n=$n")
    val prod = k * (n - k)
    val vMicro = (prod / n) * 1000000L + (prod % n) * 1000000L / n + 960400L
    val t = 1960L * math.floor(math.sqrt(vMicro.toDouble)).toLong
    math.max((k * 1000000L + 1920800L - t) / (n * 1000L + 3842L), 0L)
  }

  /** Pure twin of [[readabilityDf]] for one document (null = empty). */
  def readability(text: String)
      : (Long, Long, Long, Option[Long], Option[Long]) = {
    if (text == null) return (0L, 0L, 0L, None, None)
    val sentences = text.split("[.!?]+", -1)
      .count(_.replaceAll("^\\s+|\\s+$", "").nonEmpty).toLong
    val ws = tokens(text)
    val words = ws.size.toLong
    val syl = ws.map(w => syllables(w).toLong).sum
    if (words == 0) (sentences, 0L, 0L, None, None)
    else {
      val wps = 1000L * words / math.max(sentences, 1L)
      val spw = 1000L * syl / words
      (sentences, words, syl,
        Some(206835L - 1015L * wps / 1000L - 84600L * spw / 1000L),
        Some(390L * wps / 1000L + 11800L * spw / 1000L - 15590L))
    }
  }
}
