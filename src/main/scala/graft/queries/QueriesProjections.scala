package graft

import graft.functions.{TextAnalysis, TextFunctions, VectorFunctions}
import graft.multimodal.{DecodeStub, Multimodal}
import graft.operators.{Ann, Bm25, Chunker, Curation, Dedup, HeavyHitters, Knn, LshAnn, Mmr, MultiStageSearch, Packing, QualityModel, Rerank, RetrievalEval}
import graft.sources.JobCorpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar text transforms + projections (P*), generators (G1/G4, J1)
  * and filter guards (F3/F4).
  */
private[graft] trait QueriesProjections { self: QueriesShared =>


  private val p1 = QuerySpec("p1_clean_html",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        TextFunctions.cleanText(
          concat(lit("<b>"), col("text"), lit("</b>\n tail"))).as("clean"),
        TextFunctions.stripFences(
          concat(lit("```json\n"), col("lang"), lit("\n```"))).as("unfenced"),
        TextFunctions.normalize(concat(lit("  A "), col("lang"))).as("norm"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      trim(regexp_replace(regexp_replace('<b>' || text || '</b>' || chr(10) || ' tail',
        '<[^>]+>', '', 'g'), '\n', ' ', 'g')) AS clean,
      regexp_replace(regexp_replace('```json' || chr(10) || lang || chr(10) || '```',
        '```(json)?', '', 'g'), '^[ \t\n\r]+|[ \t\n\r]+$', '', 'g') AS unfenced,
      lower(trim('  A ' || lang)) AS norm
      FROM documents ORDER BY doc_id"""))


  private val p5 = QuerySpec("p5_chunk_ids",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        TextFunctions.chunkIdPortable(col("doc_id"), lit(0), col("text")).as("chunk_id"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      regexp_replace(doc_id || '_chunk0_' || substr(md5(substr(text, 1, 50)), 1, 16),
        '[^a-zA-Z0-9_-]', '_', 'g') AS chunk_id
      FROM documents ORDER BY doc_id"""))


  private val p2 = QuerySpec("p2_flatten_requirements",
    // P2/G3 (build_vectorstore.py:142-152): generic flatten of
    // array<map<string,array<string>>> requirement groups into
    // "key: v1 v2" lines — the map constructed from table columns so
    // the oracle can recompute the rendered string directly.
    (s, d) => t(s, d, "documents")
      .withColumn("reqs", array(
        map(lit("경력조건"), array(col("lang")),
            lit("학력"), array(col("source"), lit("이상"))),
        map(lit("고용형태"), array(lit("파트타임")))))
      .select(col("doc_id"),
        TextFunctions.flattenRequirements(col("reqs")).as("req_text"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      '경력조건: ' || lang || chr(10) || '학력: ' || source || ' 이상' ||
      chr(10) || '고용형태: 파트타임' AS req_text
      FROM documents ORDER BY doc_id"""))


  private val p3 = QuerySpec("p3_combined_ner_text",
    // P3 combined-text assembly (build_vectorstore.py:154-161) + P4
    // NER-to-text merge (build_vectorstore.py:184-194), built from
    // table columns so the oracle recomputes the exact rendered string.
    // region = nullif(lang,'zh') exercises the null→"" coalesce; the
    // NER JSON uses clean token values, where to_json is the identity
    // rendering the oracle can reproduce by concatenation.
    (s, d) => t(s, d, "documents")
      .withColumn("combined", TextFunctions.combinedText(
        col("source"), col("lang"), nullif(col("lang"), lit("zh")),
        col("n_chars").cast("string"), substring(col("text"), 1, 40), col("lang")))
      .withColumn("merged", TextFunctions.nerMerge(col("combined"),
        to_json(struct(col("lang"), col("source")))))
      .select(col("doc_id"), col("combined"), col("merged"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, combined,
      combined || chr(10) || chr(10) || '[NER 추출 정보]' || chr(10) ||
        '{"lang":"' || lang || '","source":"' || source || '"}' AS merged
      FROM (SELECT doc_id, lang, source,
        '채용제목: ' || source || chr(10) ||
        '회사명: ' || lang || chr(10) ||
        '근무지역: ' || coalesce(nullif(lang, 'zh'), '') || chr(10) ||
        '급여조건: ' || n_chars || chr(10) ||
        '직무내용: ' || substr(text, 1, 40) || chr(10) ||
        '세부요건:' || chr(10) || lang AS combined
        FROM documents)
      ORDER BY doc_id"""))


  private val p13 = QuerySpec("p13_redact_pii",
    // Training-data hygiene: regex redaction of emails/URLs + counts.
    // Explicit char classes so Java regex (Spark) and RE2 (DuckDB)
    // agree; redaction before counting so the two columns are
    // independently checkable.
    (s, d) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[A-Za-z0-9./_%-]+"
      t(s, d, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(url), lit(0))).as("n_urls"),
          substring(regexp_replace(regexp_replace(col("text"), email, "[EMAIL]"),
            url, "[URL]"), 1, 120).as("redacted_head"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      len(regexp_extract_all(text, 'https?://[A-Za-z0-9./_%-]+')) AS n_urls,
      substr(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[A-Za-z0-9./_%-]+', '[URL]', 'g'), 1, 120) AS redacted_head
      FROM documents ORDER BY doc_id"""))


  private val p10 = QuerySpec("p10_response_projection",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        coalesce(nullif(col("lang"), lit("zh")), lit("정보없음")).as("lang_or_default"),
        coalesce(nullif(col("source"), lit("src0")), lit("no_id")).as("source_or_default"),
        regexp_replace(substring(col("text"), 1, 100), "\n", " ").as("description"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      coalesce(nullif(lang, 'zh'), '정보없음') AS lang_or_default,
      coalesce(nullif(source, 'src0'), 'no_id') AS source_or_default,
      regexp_replace(substr(text, 1, 100), '\n', ' ', 'g') AS description
      FROM documents ORDER BY doc_id"""))

  // ======================================================================
  // Text analysis (north star: lang-ID, quality, tokens, fingerprint)
  // ======================================================================


  /** Committed cross-language golden for the recursive chunker
    * (generated by tools/golden_chunks.py — an independent Python
    * implementation of the same published splitter semantics). */
  private val ChunkerGolden = "/root/repo/src/test/resources/chunker_golden.json"


  private val g1 = QuerySpec("g1_chunk_documents",
    // G1 with a REAL oracle: the Spark chunker runs over the committed
    // golden fixture's 24 input texts (each at its case's size/overlap
    // config); DuckDB unnests the EXPECTED chunk arrays from the same
    // JSON. A hash match means the distributed chunker reproduces the
    // cross-language golden byte-identically — the ChunkerGoldenSpec
    // parity, now enforced by the harness gate too. Fixture-driven
    // like j1, not sf-dir-driven (a recursive splitter over sf-dir
    // documents has no SQL-expressible expected output).
    (s, _) => {
      val cases = s.read.option("multiLine", true)
        .schema("name STRING, chunk_size INT, overlap INT, text STRING, " +
          "chunks ARRAY<STRING>")
        .json(ChunkerGolden)
      // one Chunker per (size, overlap) config present — bounded by
      // the 24 fixture cases, collected once on the driver
      val configs = cases.select("chunk_size", "overlap").distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
      configs.map { case (cs, ov) =>
        Chunker(chunkSize = cs, overlap = ov)(
          cases.filter(col("chunk_size") === cs && col("overlap") === ov), "text")
          .select(col("name"), col("chunk_index"), col("chunk"))
      }.reduce(_ unionByName _)
        .orderBy("name", "chunk_index")
    },
    Some(s"""SELECT name, chunk_index, chunk FROM (
        SELECT name, CAST(unnest(range(len(chunks))) AS INT) AS chunk_index,
          unnest(chunks) AS chunk
        FROM read_json('$ChunkerGolden'))
      ORDER BY name, chunk_index"""))


  private val g4 = QuerySpec("g4_synonym_expand",
    (s, d) => {
      import s.implicits._
      val dict = Seq(("join", "merge"), ("join", "hash"), ("sort", "order"),
        ("query", "scan"), ("query", "filter"), ("stream", "batch"))
        .toDF("job", "syn")
      broadcast(dict).join(t(s, d, "documents"), col("text").contains(col("syn")))
        .groupBy("job", "syn")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("job", "syn")
    },
    Some("""SELECT job, syn, count(*) AS n_docs, min(doc_id) AS first_doc
      FROM (VALUES ('join','merge'),('join','hash'),('sort','order'),
        ('query','scan'),('query','filter'),('stream','batch')) d(job, syn)
      JOIN documents ON contains(text, syn)
      GROUP BY job, syn ORDER BY job, syn"""))


  /** Committed jobs.json-shaped fixture (synthetic postings, Korean
    * keys and values, null/missing/empty requirement edges) — the
    * nested-source ingest is fixture-driven, not sf-dir-driven. */
  private val JobsFixture = "/root/repo/src/test/resources/jobs_fixture.json"


  private val j1 = QuerySpec("j1_jobs_ingest",
    // S1/G2 nested read+explode → G3/P2 requirement flatten → P1 clean
    // → P3 combine → P5-style id, end-to-end on the REAL nested schema
    // (build_vectorstore.py:104-161) via the library's own
    // JobCorpus.readPostings + combine. The oracle re-derives the
    // rendered combined text in DuckDB from the same JSON (read_json
    // with Korean keys + MAP requirement groups), so every projection
    // the offline build applies before chunking is hash-checked.
    (s, _) => JobCorpus.combine(JobCorpus.readPostings(s, JobsFixture))
      .select(col("posting_no"),
        TextFunctions.cleanText(col("title")).as("title_clean"),
        md5(col("combined_text")).as("combined_md5"),
        length(col("combined_text")).as("n_chars"),
        TextFunctions.chunkIdPortable(col("posting_no"), lit(0),
          col("combined_text")).as("head_chunk_id"))
      .orderBy("posting_no"),
    Some(s"""WITH raw AS (
        SELECT unnest("채용공고목록") AS p
        FROM read_json('$JobsFixture',
          columns = {
            '검색조건': 'VARCHAR', '총_채용공고수': 'BIGINT', '수집일시': 'VARCHAR',
            '채용공고목록': 'STRUCT("공고번호" BIGINT, "채용제목" VARCHAR,
              "회사명" VARCHAR, "근무지역" VARCHAR, "급여조건" VARCHAR,
              "채용공고ID" VARCHAR, "채용공고URL" VARCHAR,
              "상세정보" STRUCT("직무내용" VARCHAR,
                "세부요건" MAP(VARCHAR, VARCHAR[])[]))[]'
          })),
      cleaned AS (
        SELECT p."공고번호" AS posting_no,
          trim(regexp_replace(regexp_replace(p."채용제목", '<[^>]+>', '', 'g'),
            '\n', ' ', 'g')) AS title_clean,
          trim(regexp_replace(regexp_replace(p."회사명", '<[^>]+>', '', 'g'),
            '\n', ' ', 'g')) AS company_clean,
          trim(regexp_replace(regexp_replace(p."근무지역", '<[^>]+>', '', 'g'),
            '\n', ' ', 'g')) AS region_clean,
          trim(regexp_replace(regexp_replace(p."급여조건", '<[^>]+>', '', 'g'),
            '\n', ' ', 'g')) AS salary_clean,
          trim(regexp_replace(regexp_replace(p."상세정보"."직무내용",
            '<[^>]+>', '', 'g'), '\n', ' ', 'g')) AS duties_clean,
          coalesce(array_to_string(
            flatten(list_transform(coalesce(p."상세정보"."세부요건", []),
              m -> list_transform(map_entries(m),
                e -> e.key || ': ' || array_to_string(e.value, ' ')))),
            chr(10)), '') AS req_text
        FROM raw),
      combined AS (
        SELECT posting_no, title_clean,
          '채용제목: ' || coalesce(title_clean, '') || chr(10) ||
          '회사명: ' || coalesce(company_clean, '') || chr(10) ||
          '근무지역: ' || coalesce(region_clean, '') || chr(10) ||
          '급여조건: ' || coalesce(salary_clean, '') || chr(10) ||
          '직무내용: ' || coalesce(duties_clean, '') || chr(10) ||
          '세부요건:' || chr(10) || req_text AS combined
        FROM cleaned)
      SELECT posting_no, title_clean, md5(combined) AS combined_md5,
        len(combined) AS n_chars,
        regexp_replace(posting_no || '_chunk0_' ||
          substr(md5(substr(combined, 1, 50)), 1, 16),
          '[^a-zA-Z0-9_-]', '_', 'g') AS head_chunk_id
      FROM combined ORDER BY posting_no"""))

  // ======================================================================
  // Multimodal plumbing: opaque binary + typed metadata (north star).
  // Decode itself is an external boundary (stubbed deterministically in
  // graft.multimodal); the engine-side schema/partition plumbing is real.
  // ======================================================================


  private val p9 = QuerySpec("p9_snippet",
    // P9 (main.py:236-250): display snippet with 정보없음 defaults and
    // a substring-of-text description fallback.
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        concat(
          lit("제목: "), coalesce(nullif(col("source"), lit("")), lit("정보없음")),
          lit("\n언어: "), coalesce(nullif(col("lang"), lit("")), lit("정보없음")),
          lit("\n요약: "), regexp_replace(substring(col("text"), 1, 100), "\n", " "))
          .as("snippet"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      '제목: ' || coalesce(nullif(source, ''), '정보없음') || chr(10) ||
      '언어: ' || coalesce(nullif(lang, ''), '정보없음') || chr(10) ||
      '요약: ' || regexp_replace(substr(text, 1, 100), '\n', ' ', 'g') AS snippet
      FROM documents ORDER BY doc_id"""))


  private val p12 = QuerySpec("p12_condition_render",
    // P12 (main.py:263-271): render only the present NER fields.
    (s, d) => {
      val job = nullif(regexp_extract(lower(col("text")),
        "\\b(join|merge|sort|scan)\\b", 1), lit(""))
      val region = nullif(regexp_extract(lower(col("text")),
        "\\b(row|line|column|key)\\b", 1), lit(""))
      t(s, d, "documents")
        .select(col("doc_id"),
          concat_ws(", ",
            when(job.isNotNull, concat(lit("직무="), job)),
            when(region.isNotNull, concat(lit("근무지역="), region)))
            .as("condition"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, concat_ws(', ',
        CASE WHEN job <> '' THEN '직무=' || job END,
        CASE WHEN region <> '' THEN '근무지역=' || region END) AS condition
      FROM (SELECT doc_id,
        regexp_extract(lower(text), '\b(join|merge|sort|scan)\b', 1) AS job,
        regexp_extract(lower(text), '\b(row|line|column|key)\b', 1) AS region
        FROM documents)
      ORDER BY doc_id"""))


  private val f3 = QuerySpec("f3_ner_json_filter",
    // P8 serialize → P7 permissive parse → F3 metadata filter round
    // trip (main_remind.py:409-447): parse-failure rows are skipped via
    // the null guard, survivors filter on struct fields.
    (s, d) => {
      val nerSchema = org.apache.spark.sql.types.StructType
        .fromDDL("lang STRING, source STRING")
      t(s, d, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("source"))))
        .withColumn("ner", from_json(col("meta"), nerSchema))
        .filter(col("ner").isNotNull && col("ner.lang") === "en")
        .select(col("doc_id"), col("ner.source").as("src"))
        .orderBy("doc_id")
    },
    // Oracle mirrors the SEMANTICS (serialize→parse is identity on
    // clean fields); the permissive-parse failure path is covered by e2.
    Some("""SELECT doc_id, source AS src FROM documents
      WHERE lang = 'en' ORDER BY doc_id"""))


  private val f4 = QuerySpec("f4_meta_validate",
    // Metadata schema validation (main_remind.py:250-276): per doc,
    // parse the NER-metadata JSON and report parse failures + missing
    // required keys ("직무", "근무 지역", "연령대") — the reference's
    // log-only pass as a first-class validation relation. JSON is
    // built from table columns with a conditionally-present key and
    // deterministically corrupted every 7th doc to exercise the
    // parse-failure path (the e2 pattern).
    (s, d) => {
      val required = array(lit("직무"), lit("근무 지역"), lit("연령대"))
      t(s, d, "documents")
        .withColumn("meta0", to_json(map_from_entries(filter(
          array(
            struct(lit("직무").as("key"), col("lang").as("value")),
            struct(lit("근무 지역").as("key"),
              nullif(col("source"), lit("src0")).as("value"))),
          e => e.getField("value").isNotNull))))
        .withColumn("meta", when(col("doc_id") % 7 === 0,
          expr("substring(meta0, 1, length(meta0)-2)")).otherwise(col("meta0")))
        .withColumn("ner", from_json(col("meta"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .withColumn("parse_ok", col("ner").isNotNull)
        .withColumn("missing_keys", when(col("parse_ok"),
          array_join(filter(required,
            k => !array_contains(map_keys(col("ner")), k)), ",")))
        .select(col("doc_id"), col("parse_ok"), col("missing_keys"),
          (col("parse_ok") && length(col("missing_keys")) === 0).as("valid"))
        .orderBy("doc_id")
    },
    // json_keys is vectorized over ALL rows even under CASE, so it runs
    // on '{}' for corrupt rows (safe_meta) and the outer CASE masks it.
    Some("""SELECT doc_id, parse_ok,
        CASE WHEN parse_ok THEN array_to_string(
          list_filter(['직무', '근무 지역', '연령대'],
            k -> NOT list_contains(json_keys(safe_meta), k)), ',') END AS missing_keys,
        (parse_ok AND len(list_filter(['직무', '근무 지역', '연령대'],
            k -> NOT list_contains(json_keys(safe_meta), k))) = 0) AS valid
      FROM (SELECT doc_id, json_valid(meta) AS parse_ok,
        CASE WHEN json_valid(meta) THEN meta ELSE '{}' END AS safe_meta FROM (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN substr(j, 1, len(j)-2) ELSE j END AS meta
        FROM (SELECT doc_id,
          '{"직무":"' || lang || '"' ||
          CASE WHEN source <> 'src0'
               THEN ',"근무 지역":"' || source || '"' ELSE '' END ||
          '}' AS j
          FROM documents)))
      ORDER BY doc_id"""))

  final def queriesProjections: Seq[QuerySpec] = Seq(p1, p2, p3, p5, p9, p10, p12, p13, g1, g4, j1, f3, f4)
}
