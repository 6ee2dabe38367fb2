package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * All heuristics are engine-portable: md5 (identical algorithm in Spark
  * and DuckDB) supplies every hash; token ops use array/list lambdas;
  * ratios are single int/int double divisions (IEEE-deterministic).
  * Documents are single-space-separated word soup; tokenization is a plain
  * split on ' '.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def toks: Column = split(col("text"), " ")

  /** distinct word-3-gram shingles of the token array (1-indexed like
    * DuckDB's lists, so the SQL mirrors exactly). */
  private def shingles(t: Column): Column =
    array_distinct(transform(
      sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))

  private val duckShingles =
    "list_distinct(list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"

  /** minhash component i: lexicographic min over shingles of a 16-hex-char
    * md5-derived hash — string min avoids hex→int portability issues. */
  private def minhashSig(sh: Column, i: Int): Column =
    array_min(transform(sh, s => substring(md5(concat(lit(s"$i:"), s)), 1, 16)))

  private def duckMinhashSig(i: Int): String =
    s"list_min(list_transform(sh, s -> substr(md5('$i:' || s), 1, 16)))"

  private val stop = Map(
    "en" -> Seq("the", "a", "of"),
    "fr" -> Seq("le", "les", "une"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "una"))

  private def stopCount(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isin(words.map(lit(_)): _*)))

  private def duckStopCount(words: Seq[String]): String =
    s"len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** deterministic argmax with fixed priority en > fr > de > es */
  private val argmaxSql =
    """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
      |     WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
      |     WHEN s_de >= s_es THEN 'de'
      |     ELSE 'es' END""".stripMargin

  val defs: Map[String, Q] = Map(
    // Token counting (whitespace tokenizer) — scan-only, codegen'd.
    "q_doc_token_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_uniq_tokens"),
          length(col("text")).as("n_chars_calc"))
    },

    // Quality scoring: token/stopword/length heuristics. The keep-filter
    // compares n_stop*10 >= n_tokens in integer space (no float boundary).
    "q_doc_quality" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), size(toks).as("n_tokens"),
          stopCount(toks, stop("en")).as("n_stop"),
          (length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks)).as("mean_token_len"))
        .withColumn("keep", col("n_tokens") >= 20 && col("n_stop") * 10 >= col("n_tokens"))
    },

    // Language ID: per-language stopword hit counts + deterministic argmax.
    "q_doc_langid" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          stopCount(toks, stop("en")).as("s_en"),
          stopCount(toks, stop("fr")).as("s_fr"),
          stopCount(toks, stop("de")).as("s_de"),
          stopCount(toks, stop("es")).as("s_es"))
        .withColumn("lang_pred", expr(argmaxSql))
    },

    // Document fingerprint (normalization + content hash).
    "q_doc_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
    },

    // Exact dedup: hash-groupBy on content digest; map-side partial agg
    // means only |distinct| rows shuffle at scale.
    "q_doc_dedup_exact" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
    },

    // n-gram Jaccard similarity between consecutive docs (deterministic
    // pair choice keeps the oracle exact; the LSH query below finds real
    // candidate pairs at scale).
    "q_doc_ngram_jaccard" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .filter(size(toks) >= 3)
        .select(col("doc_id"), shingles(toks).as("sh"))
      val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = d.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, "id_a")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).as("n_shared"),
          size(array_union(col("sh_a"), col("sh_b"))).as("n_union"))
        .withColumn("jaccard", col("n_shared").cast("double") / col("n_union"))
    },

    // MinHash signatures (8 hashes over word-3-gram shingles).
    "q_doc_minhash_sig" -> { (s, dir) =>
      val base = Tables(s, dir, "documents")
        .filter(size(toks) >= 3)
        .select(col("doc_id"), shingles(toks).as("sh"))
      (0 until 8).foldLeft(base) { (df, i) =>
        df.withColumn(s"sig$i", minhashSig(col("sh"), i))
      }.drop("sh")
    },

    // MinHash-LSH near-dup candidates: 4 bands × 2 rows, bucket-join on
    // band hash (the scale path: shuffle on band key, no all-pairs scan),
    // then exact Jaccard verification on candidates. a<b dedups pairs.
    "q_doc_minhash_pairs" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .filter(size(toks) >= 3)
        .select(col("doc_id"), shingles(toks).as("sh"))
      val sigs = (0 until 8).foldLeft(d) { (df, i) =>
        df.withColumn(s"sig$i", minhashSig(col("sh"), i))
      }
      val banded = sigs.select(col("doc_id"), col("sh"),
        array((0 until 4).map(bnd =>
          struct(lit(bnd).as("band_idx"),
            md5(concat(col(s"sig${2 * bnd}"), col(s"sig${2 * bnd + 1}"))).as("band_hash"))): _*).as("bands"))
        .select(col("doc_id"), col("sh"), explode(col("bands")).as("b"))
        .select(col("doc_id"), col("sh"), col("b.band_idx"), col("b.band_hash"))
      val l = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val r = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      l.join(r, Seq("band_idx", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b").distinct()
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    },

    // SimHash (16-bit): per-token 60-bit md5 hash, signed bit votes,
    // reassembled fingerprint. explode + one aggregate.
    "q_doc_simhash" -> { (s, dir) =>
      val tokens = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(toks)).as("tok"))
        .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      val votes = (0 until 16).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
      val sim = (0 until 16).map(j =>
        when(col(s"v$j") > 0, lit(1L) * (1L << j)).otherwise(0L))
        .reduce(_ + _)
      tokens.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), sim.as("simhash"))
    }
  )

  private val duckToks = s"string_split(text, ' ') AS toks"

  val oracles: Map[String, String] = Map(
    "q_doc_token_stats" ->
      s"""SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq_tokens,
        | length(text) AS n_chars_calc
        |FROM (SELECT doc_id, text, $duckToks FROM documents)""".stripMargin,
    "q_doc_quality" ->
      s"""SELECT doc_id, n_tokens, n_stop, mean_token_len,
        | (n_tokens >= 20 AND n_stop * 10 >= n_tokens) AS keep
        |FROM (SELECT doc_id, len(toks) AS n_tokens,
        |  ${duckStopCount(stop("en"))} AS n_stop,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS mean_token_len
        | FROM (SELECT doc_id, text, $duckToks FROM documents))""".stripMargin,
    "q_doc_langid" ->
      s"""SELECT doc_id, lang, s_en, s_fr, s_de, s_es,
        | $argmaxSql AS lang_pred
        |FROM (SELECT doc_id, lang,
        |  ${duckStopCount(stop("en"))} AS s_en,
        |  ${duckStopCount(stop("fr"))} AS s_fr,
        |  ${duckStopCount(stop("de"))} AS s_de,
        |  ${duckStopCount(stop("es"))} AS s_es
        | FROM (SELECT doc_id, lang, $duckToks FROM documents))""".stripMargin,
    "q_doc_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
    "q_doc_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_doc_ngram_jaccard" ->
      s"""WITH d AS (
        | SELECT doc_id, $duckShingles AS sh
        | FROM (SELECT doc_id, $duckToks FROM documents)
        | WHERE len(toks) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | len(list_intersect(a.sh, b.sh)) AS n_shared,
        | len(list_distinct(list_concat(a.sh, b.sh))) AS n_union,
        | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_doc_minhash_sig" ->
      s"""SELECT doc_id, ${(0 until 8).map(i => s"${duckMinhashSig(i)} AS sig$i").mkString(", ")}
        |FROM (SELECT doc_id, $duckShingles AS sh
        |      FROM (SELECT doc_id, $duckToks FROM documents) WHERE len(toks) >= 3)""".stripMargin,
    "q_doc_minhash_pairs" ->
      s"""WITH d AS (
        | SELECT doc_id, sh, ${(0 until 8).map(i => s"${duckMinhashSig(i)} AS sig$i").mkString(", ")}
        | FROM (SELECT doc_id, $duckShingles AS sh
        |       FROM (SELECT doc_id, $duckToks FROM documents) WHERE len(toks) >= 3)),
        |banded AS (
        | ${(0 until 4).map(b =>
             s"SELECT doc_id, sh, $b AS band_idx, md5(sig${2 * b} || sig${2 * b + 1}) AS band_hash FROM d")
             .mkString("\n UNION ALL ")}),
        |pairs AS (
        | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
        | FROM banded a JOIN banded b
        |  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        | CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
        |   / len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard
        |FROM pairs
        |WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
        |   / len(list_distinct(list_concat(sh_a, sh_b))) >= 0.5""".stripMargin,
    "q_doc_simhash" ->
      s"""WITH tok AS (
        | SELECT doc_id, CAST('0x' || substr(md5(t.tok), 1, 15) AS BIGINT) AS h
        | FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |       FROM documents) t),
        |votes AS (
        | SELECT doc_id,
        |  ${(0 until 16).map(j =>
             s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(", ")}
        | FROM tok GROUP BY doc_id)
        |SELECT doc_id,
        | ${(0 until 16).map(j => s"(CASE WHEN v$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)").mkString(" + ")} AS simhash
        |FROM votes""".stripMargin
  )
}
