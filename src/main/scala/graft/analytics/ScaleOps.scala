package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.{Dedup, TextStats}

/** Scale-path operators added in round 6b: deterministic similarity
  * joins, sketch-vs-exact certifications, and corpus statistics whose
  * plans are explicitly designed for the 100 TB regime. Every declared
  * query here carries a value-level DuckDB oracle unless its semantics
  * are genuinely approximate, in which case the oracle checks an exact
  * certification contract computed alongside (the q42 playbook).
  */
object ScaleOps {
  import Relational.QFn

  private val ws = TextStats.wsClassSql

  val defs: Seq[(String, QFn, Option[String])] = Seq(

    // ---- prefix-filtered EXACT Jaccard similarity join (AllPairs/
    //      PPJoin): the deterministic scale path for thresholds below
    //      the banded-MinHash cutoff. The oracle is the exact all-pairs
    //      Jaccard over string shingles — the prefix filter provably
    //      generates a candidate superset (Bayardo 2007 theorem), and
    //      verification is exact, so the outputs must match EXACTLY,
    //      unlike the probabilistic q37 whose equality holds only up to
    //      a 1e-12 band-miss bound. xxhash64 shingle keys vs string
    //      shingles is the q37 collision argument (≈2⁻⁶⁴ per pair).
    ("q91_jaccard_join", (s: SparkSession, dir: String) => {
      Dedup.jaccardJoinPrefix(Tables(s, dir).documents, threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("jaccard_r"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH sh AS (
        SELECT doc_id AS id,
               CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                    ELSE list_distinct(list_transform(
                      range(1, greatest(len(toks) - 2, 1) + 1),
                      i -> array_to_string(toks[i:i+2], ' '))) END AS s
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '$ws+'), t -> t <> '') AS toks
              FROM documents))
      SELECT a.id AS id_a, b.id AS id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 9) AS jaccard_r
      FROM sh a, sh b WHERE a.id < b.id
        AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / greatest(len(list_distinct(list_concat(a.s, b.s))), 1) >= 0.4
      ORDER BY id_a, id_b"""))
  )
}
