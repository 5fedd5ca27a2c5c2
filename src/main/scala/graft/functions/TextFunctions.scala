package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text transforms from the reference's projection layer
  * (SURVEY.md §2.2), re-expressed as codegen'd Spark built-ins —
  * no UDFs anywhere on this surface.
  *
  * Reference semantics:
  *  - P1  clean_text:      /root/reference/build_vectorstore.py:115-118
  *  - P2  requirements:    /root/reference/build_vectorstore.py:142-152
  *  - P3  combined text:   /root/reference/build_vectorstore.py:154-161
  *  - P4  NER-to-text:     /root/reference/build_vectorstore.py:184-194
  *  - P5  chunk ids:       /root/reference/build_vectorstore.py:200-203
  *  - P6  fence strip:     /root/reference/main.py:214,288,434
  *  - P11 normalize:       /root/reference/main.py:229-230,337-338
  */
object TextFunctions {

  /** P1: strip HTML tags, newlines→space, trim. Non-string inputs are
    * the caller's problem in Spark (schema-typed); nulls stay null and
    * are defaulted at projection time like the reference's `""`. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]+>", ""), "\n", " "))

  /** P6: remove markdown code fences from LLM-ish output. The trim is
    * an explicit whitespace-class replace because the reference's
    * Python `.strip()` removes newlines too, while SQL `trim` only
    * removes spaces (/root/reference/main.py:214). */
  def stripFences(c: Column): Column =
    regexp_replace(regexp_replace(c, "```(json)?", ""),
      "^[ \t\n\r]+|[ \t\n\r]+$", "")

  /** P11: case/space normalize before every comparison. */
  def normalize(c: Column): Column = lower(trim(c))

  /** P2: flatten `array<map<string,array<string>>>` requirement groups
    * into "key: v1 v2" lines joined by newlines — the generic
    * `for k, v in requirement.items()` loop as one expression. */
  def flattenRequirements(c: Column): Column =
    array_join(
      flatten(transform(c, m =>
        transform(map_entries(m), e =>
          concat(e.getField("key"), lit(": "),
            array_join(e.getField("value"), " "))))),
      "\n")

  /** P3: labeled combined-text blob for embedding. Fields in the
    * reference's order (title, company, region, salary, duties, reqs). */
  def combinedText(title: Column, company: Column, region: Column,
                   salary: Column, duties: Column, reqs: Column): Column =
    concat_ws("\n",
      concat(lit("채용제목: "), coalesce(title, lit(""))),
      concat(lit("회사명: "), coalesce(company, lit(""))),
      concat(lit("근무지역: "), coalesce(region, lit(""))),
      concat(lit("급여조건: "), coalesce(salary, lit(""))),
      concat(lit("직무내용: "), coalesce(duties, lit(""))),
      concat(lit("세부요건:\n"), coalesce(reqs, lit(""))))

  /** P4: append NER JSON to the text so it participates in embedding. */
  def nerMerge(text: Column, nerJson: Column): Column =
    concat(text, lit("\n\n[NER 추출 정보]\n"), nerJson)

  /** P5: deterministic chunk id. The reference uses Python `hash()`
    * (process-salted ⇒ non-reproducible); we substitute a stable
    * 64-bit hash of the chunk's 50-char prefix — documented deviation.
    * `sanitize` mirrors its `re.sub('[^a-zA-Z0-9_-]','_')`. */
  def chunkId(postingNo: Column, chunkIndex: Column, text: Column): Column =
    regexp_replace(
      concat_ws("_", postingNo, concat(lit("chunk"), chunkIndex),
        xxhash64(substring(text, 1, 50))),
      "[^a-zA-Z0-9_-]", "_")

  /** P5 variant with a cross-engine hash (md5 prefix) — used where the
    * result must be reproducible by a non-Spark oracle. */
  def chunkIdPortable(postingNo: Column, chunkIndex: Column, text: Column): Column =
    regexp_replace(
      concat_ws("_", postingNo, concat(lit("chunk"), chunkIndex),
        substring(md5(substring(text, 1, 50)), 1, 16)),
      "[^a-zA-Z0-9_-]", "_")
}
