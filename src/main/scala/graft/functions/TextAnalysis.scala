package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface (north
  * star beyond the reference — BASELINE.json): language ID, quality
  * scoring, token counting, document fingerprinting. All pure built-in
  * expressions (codegen'd, pushdown-friendly) with exact DuckDB-SQL
  * mirrors, so every one is oracle-checkable.
  *
  * Regex classes are written with explicit character ranges (no \w, \p)
  * so Java-regex (Spark) and RE2 (DuckDB) agree.
  */
object TextAnalysis {

  /** Whitespace tokens; empty/blank text counts 0. */
  def tokenCountWs(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "[ \t\n]+")))

  /** BPE-ish subword tokens: letter runs, digit runs, single symbols. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]"
  def tokenCountBpeish(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeishPattern), lit(0)))

  /** Heuristic quality score in [0,1]:
    * 0.4·min(len/500,1) + 0.3·(1 − punct_ratio) + 0.3·stopword_ratio. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 500.0, lit(1.0))
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9 \t\n]"), lit(0))).cast("double")
    val punctRatio = when(len === 0, lit(0.0)).otherwise(punct / len)
    val toks = tokenCountWs(text).cast("double")
    val stop = size(regexp_extract_all(lower(text),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0))).cast("double")
    val stopRatio = when(toks === 0, lit(0.0)).otherwise(least(stop / toks, lit(1.0)))
    round(lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatio) + lit(0.3) * stopRatio, 6)
  }

  /** N-gram heuristic language ID: count whole-word marker hits per
    * language, argmax with a deterministic tie-break (marker order),
    * 'und' when nothing matches. Marker sets are tiny by design — the
    * operator's value is the *shape* (per-language profile → argmax),
    * which scales to real profiles without changing the plan. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|to)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|los|las|es|y)\\b",
    "zh" -> "[一-鿿]")

  def langId(text: Column): Column = {
    val t = lower(text)
    val scores = LangMarkers.map { case (lang, pat) =>
      lang -> size(regexp_extract_all(t, lit(pat), lit(0)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), elseCol) =>
      when(s > 0 && s === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Document fingerprint: md5 over the sorted distinct token set —
    * stable under token reordering/duplication (near-dup canon form). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(
      split(lower(trim(text)), "[ \t\n]+"))), " "))

  /** Winnowing fingerprint grams (rolling-hash document fingerprinting
    * à la MOSS): hash every char k-gram, then keep the MINIMUM hash of
    * each sliding window of `w` consecutive gram hashes. Guarantees at
    * least one shared fingerprint for any match of length ≥ w+k−1,
    * while storing ~2/(w+1) of the hashes. Returns (pos, gram_hash)
    * rows pre-window — compose with a ROWS window min + distinct (see
    * Queries t6 for the full plan; both Spark and DuckDB express the
    * rolling window as `ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`).
    * Gram hash = first 60 bits of md5 (hex→numeric, engine-portable).
    * Also emits `n_grams` (= len−k+1, the max pos of the doc), carried
    * from generation time as a per-row constant: downstream "full
    * windows only" trims filter on it directly instead of paying a
    * whole-partition `max(pos)` window — one fewer pass over the
    * exploded gram set, which outnumbers documents ~1000:1. */
  def charGramHashes(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        (length(col(textCol)) - (k - 1)).cast("int").as("n_grams"),
        posexplode(
          when(length(col(textCol)) >= k,
            transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
              i => col(textCol).substr(i, lit(k))))
            .otherwise(array().cast("array<string>")))
          .as(Seq("pos0", "gram")))
      .select(col("doc_id"), col("n_grams"), (col("pos0") + 1).as("pos"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("gram_hash"))

  /** The whole winnowing selection ([[charGramHashes]] + sliding-window
    * min + distinct) as ONE narrow per-document expression — the shape
    * a 100 TB fingerprinting pass actually wants. Winnowing is a
    * per-document function, yet the exploded-gram formulation pays an
    * exchange to reunite gram rows that started co-located (partition
    * the ~1000·|docs| gram stream by doc_id, sort, window, then a
    * second distinct exchange). Here the grams never leave the row:
    * hash array → sliding min as `w` shifted slices folded with
    * elementwise least → array_distinct, zero shuffles.
    *
    * Two deliberate mechanics: the hash array is materialized in its
    * OWN projection and referenced `w` times by the slices — multiple
    * references to a non-cheap expression stop CollapseProject from
    * inlining the md5 transform into each slice (the O(n·w)→O(n²)
    * re-evaluation trap the shinglesFast scaladoc documents); and the
    * shifted-slice fold avoids nesting `array_min(slice(...))` inside
    * a lambda, where the array child would be evaluated per element.
    * Same hash arithmetic and full-windows-only trim as the windowed
    * form (docs with fewer than w full windows drop out); t6's DuckDB
    * oracle is unchanged, so the rewrite is hash-checked rather than
    * trusted. Returns (doc_id, fps array<long> — the distinct
    * fingerprints, window order). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val text = col(textCol)
    val hashes = transform(
      sequence(lit(1), length(text) - (k - 1)),
      i => conv(substring(md5(text.substr(i, lit(k))), 1, 15), 16, 10)
        .cast("long"))
    val base = df
      .filter(length(text) >= k + w - 1) // at least one full window
      .select(col(idCol).as("doc_id"), hashes.as("__h"),
        (length(text) - (k - 1) - (w - 1)).cast("int").as("__m"))
    val slid = (0 until w)
      .map(j => slice(col("__h"), lit(j + 1), col("__m")))
      .reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    base.select(col("doc_id"), array_distinct(slid).as("fps"))
  }

  /** Distinct word k-shingles (word n-grams) — the unit for MinHash /
    * Jaccard dedup. Empty array when the text has fewer than k words. */
  def shingles(text: Column, k: Int): Column = {
    val ws = split(trim(text), "[ \t\n]+")
    when(size(ws) < k, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(1), size(ws) - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*))))
  }

  /** Same semantics as [[shingles]] via a tight Scala loop. The HOF
    * expression tree (sequence → transform → concat_ws of element_at)
    * is interpreted per element and measured ~1 ms/document; inside
    * corpus-dedup pipelines that tree sits post-shuffle in several
    * join subtrees and re-executes per subtree. A UDF is justified
    * here by §4's own rule: genuinely imperative per-row logic on the
    * hot path. Equality with the expression form is spec-asserted. */
  def shinglesFast(text: Column, k: Int): Column = {
    val f = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else {
        // match SQL semantics exactly: trim() strips SPACES only, and
        // split keeps leading/trailing empty tokens (Java's default
        // split drops trailing ones — hence limit -1).
        var st = 0
        var en = t.length
        while (st < en && t.charAt(st) == ' ') st += 1
        while (en > st && t.charAt(en - 1) == ' ') en -= 1
        val ws = t.substring(st, en).split("[ \t\n]+", -1)
        if (ws.length < k) Array.empty[String]
        else {
          val seen = new java.util.LinkedHashSet[String]
          var i = 0
          val sb = new java.lang.StringBuilder
          while (i <= ws.length - k) {
            sb.setLength(0)
            var j = 0
            while (j < k) {
              if (j > 0) sb.append(' ')
              sb.append(ws(i + j))
              j += 1
            }
            seen.add(sb.toString)
            i += 1
          }
          val out = new Array[String](seen.size)
          seen.toArray(out)
          out
        }
      }
    }
    f(text)
  }

  /** Jaccard similarity of two string arrays (assumed distinct). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Per-line language segmentation: split each document on newlines,
    * run [[langId]] per non-empty line, and roll up a per-document
    * routing profile — majority line language (count desc, lang asc —
    * the q11 min(struct) argmax, so the winner is an aggregate, not a
    * window over the full corpus), the whole-document [[langId]] for
    * comparison, and a `mixed` flag (>1 distinct non-'und' line
    * language) marking documents that need language-aware splitting
    * before they hit per-language pipelines. Documents with no
    * non-empty line (empty/whitespace text) drop out, loudly absent
    * rather than silently 'und'.
    *
    * 100 TB shape: explode lines → narrow regex maps → ONE
    * (doc, lang)-keyed partial count (map-side combinable; the
    * exchange carries counts per (doc, lang) — ≤ 6 rows per doc —
    * never line text) → doc-keyed final roll-up. */
  def lineLangProfile(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("doc_id"),
      langId(col(textCol)).as("doc_lang"),
      explode(filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => length(l) > 0)).as("__line"))
    val perLang = lines
      .groupBy(col("doc_id"), col("doc_lang"),
        langId(col("__line")).as("line_lang"))
      .agg(count(lit(1)).as("__cnt"))
    perLang.groupBy("doc_id", "doc_lang")
      .agg(
        min(struct((-col("__cnt")).as("nc"), col("line_lang").as("l")))
          .as("__m"),
        sum("__cnt").as("n_lines"),
        count(when(col("line_lang") =!= "und", lit(1))).as("__n_langs"))
      .select(col("doc_id"), col("doc_lang"),
        col("__m.l").as("line_major"),
        (-col("__m.nc")).as("n_major"),
        col("n_lines"),
        (col("__n_langs") > 1).as("mixed"))
  }
}
