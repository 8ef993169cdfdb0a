package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.{QueryDef, QueryPack, Tables}
import graft.functions.RollingHash.rolling_hash
import graft.functions.VectorFunctions

/** Deduplication operators for the training-data-pipeline track
  * (SURVEY.md §2.3): exact content-hash dedup (generalizing the
  * reference's sha-256 identity check, `FtpMonitor.scala:56,96-99`),
  * MinHash signatures + banded LSH candidate pairs, SimHash with
  * hamming-distance pairs, word-shingle Jaccard, and embedding-cosine
  * near-duplicates.
  *
  * Engine-neutral hashing: every hash is a polynomial rolling hash
  * (`graft.functions.RollingHash`, a codegen'd Catalyst expression) —
  * the same fold is ANSI-SQL-expressible, so even the MinHash/SimHash
  * *values* are oracle-checked, not just row counts.
  *
  * Scale design: shingling/hashing are per-row map work in the scan
  * stage (whole-stage codegen, no shuffle); MinHash aggregates shuffle
  * (doc × 16 perms) which is O(docs), not O(shingles); LSH banding
  * turns the quadratic all-pairs problem into equality joins on band
  * keys. The only intentionally quadratic queries (simhash/jaccard/
  * cosine pairs) are restricted per-group and exist to oracle-check the
  * LSH shortcuts.
  */
object Dedup extends QueryPack {

  private val Mod = 1000000007L

  private def tokensCol: Column = graft.functions.TextTokens.tokens
  private val tokensSql = graft.functions.TextTokens.tokensSql

  /** Distinct word 3-gram shingles. */
  private def shinglesCol: Column = array_distinct(expr(
    """CASE WHEN size(tokens) >= 3 THEN
         transform(sequence(1, size(tokens) - 2), i ->
           concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1]))
       ELSE array() END"""))
  private val shinglesSql =
    """list_distinct(CASE WHEN len(tokens) >= 3 THEN
         list_transform(generate_series(3, len(tokens)), i ->
           tokens[i-2] || ' ' || tokens[i-1] || ' ' || tokens[i])
       ELSE [] END)"""

  /** DuckDB twin of RollingHash(prime) for a non-empty string expr. */
  private def fpSql(v: String, prime: Int): String =
    s"""list_reduce(list_prepend(0::BIGINT,
          list_transform(string_split($v, ''), ch -> unicode(ch)::BIGINT)),
        (acc, ch) -> (acc * $prime + ch) % $Mod)"""

  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("tokens", tokensCol)

  private def materialized(df: DataFrame): DataFrame =
    graft.functions.TextTokens.materialized(df)

  /** 60-bit SimHash as a single aggregation: each bit's vote is its own
    * sum-aggregate over the grouped token fingerprints (`fp` column),
    * and the sketch is assembled in the projection — one shuffle of one
    * row per group, map-side combined. */
  private def simhashOf(grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = {
    val votes = (0 until 60).map(b =>
      sum(when(expr(s"(fp >> $b) & 1") === 1, 1).otherwise(-1)).as(s"v$b"))
    grouped.agg(votes.head, votes.tail: _*)
      .withColumn("simhash",
        (0 until 60).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _))
  }

  override val queries: Map[String, QueryDef] = Map(

    // ── exact dedup: group identical bodies by sha-256 ──
    "dedup_exact" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .groupBy(sha2($"text", 256).as("body_sha256"))
          .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
          .orderBy($"body_sha256")
      },
      oracle = Some("""
        SELECT sha256(text) AS body_sha256,
               MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM documents
        GROUP BY sha256(text)
        ORDER BY body_sha256""")),

    // ── MinHash signatures: 16 permutations over shingle fingerprints ──
    // minhash_i = min over shingles of ((2i+1)*fp(s) + 7919i + 12345) mod p.
    // One shuffle: all 16 mins are column aggregates of a single groupBy
    // (map-side partial agg reduces shuffle volume to one row per doc),
    // then stack() unpivots to the (doc, perm, minhash) oracle shape.
    "dedup_minhash_sig" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val sh = materialized(docsWithTokens(s, d)
            .select($"doc_id", shinglesCol.as("shingles")))
          .select($"doc_id", explode($"shingles").as("shingle"))
          .withColumn("fp", rolling_hash($"shingle"))
        val aggs = (0 until 16).map(i =>
          min(((lit(2L * i + 1)) * $"fp" + lit(7919L * i + 12345)) % Mod).as(s"m$i"))
        val unpivot = (0 until 16).map(i => s"${i}L, m$i").mkString(", ")
        sh.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
          .select($"doc_id", expr(s"stack(16, $unpivot)").as(Seq("perm", "minhash")))
          .orderBy($"doc_id", $"perm")
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, $tokensSql AS tokens FROM documents),
        sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM toks),
        f AS (SELECT doc_id, ${fpSql("shingle", 31)} AS fp FROM sh)
        SELECT doc_id, perm,
               MIN(((2*perm + 1) * fp + 7919*perm + 12345) % $Mod) AS minhash
        FROM f, range(16) t(perm)
        GROUP BY doc_id, perm
        ORDER BY doc_id, perm""")),

    // ── MinHash-LSH near-dup pairs: band signatures → bucket join →
    //    exact Jaccard verification (the full shingle→minhash→band→
    //    bucket-join pipeline; LSH mechanics are Spark-side only) ──
    "dedup_minhash_pairs" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val docs = materialized(docsWithTokens(s, d)
          .select($"doc_id", shinglesCol.as("shingles")))
        val sh = docs.select($"doc_id", explode($"shingles").as("shingle"))
          .withColumn("fp", rolling_hash($"shingle"))
        // one shuffle: 16 min-aggregates in a single groupBy
        val aggs = (0 until 16).map(i =>
          min(((lit(2L * i + 1)) * $"fp" + lit(7919L * i + 12345)) % Mod).as(s"m$i"))
        val sigs16 = sh.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
        // 4 bands × 4 rows, band key built by projection (no second agg)
        val bandKeys = (0 until 4).map(b =>
          concat_ws("_", (0 until 4).map(i => col(s"m${b * 4 + i}")): _*))
        val bands = sigs16.select($"doc_id",
          posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
        val cand = bands.as("a")
          .join(bands.as("b"),
            $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("doc1"), $"b.doc_id".as("doc2"))
          .distinct()
        // verify candidates with exact shingle Jaccard
        val sets = docs.select($"doc_id", $"shingles")
        cand
          .join(sets.select($"doc_id".as("doc1"), $"shingles".as("sh1")), Seq("doc1"))
          .join(sets.select($"doc_id".as("doc2"), $"shingles".as("sh2")), Seq("doc2"))
          .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
          .withColumn("jaccard",
            $"inter".cast(DoubleType) /
              (size($"sh1") + size($"sh2") - $"inter").cast(DoubleType))
          .filter($"jaccard" >= 0.2)
          .select($"doc1", $"doc2", $"jaccard")
          .orderBy($"doc1", $"doc2")
      },
      oracle = None,
      headline = true),

    // ── SimHash: 60-bit per-document sketch, bit-vote over token fps ──
    "dedup_simhash" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val tok = materialized(docsWithTokens(s, d).select($"doc_id", $"tokens"))
          .select($"doc_id", explode($"tokens").as("t"))
          .withColumn("fp", rolling_hash($"t", 31) + rolling_hash($"t", 131) * Mod)
        // one shuffle: the 60 bit-votes are column aggregates of one
        // groupBy; the sketch is recombined in a projection
        simhashOf(tok.groupBy($"doc_id"))
          .select($"doc_id", $"simhash")
          .orderBy($"doc_id")
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, $tokensSql AS tokens FROM documents),
        tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks),
        f AS (SELECT doc_id,
                ${fpSql("t", 31)} + ${fpSql("t", 131)} * $Mod AS fp FROM tok),
        votes AS (
          SELECT doc_id, b, SUM(CASE WHEN (fp >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM f, range(60) t(b)
          GROUP BY doc_id, b)
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
                 AS simhash
        FROM votes
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // ── SimHash near-dup pairs: hamming distance within language ──
    "dedup_simhash_pairs" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val tok = materialized(docsWithTokens(s, d).select($"doc_id", $"lang", $"tokens"))
          .select($"doc_id", $"lang", explode($"tokens").as("t"))
          .withColumn("fp", rolling_hash($"t", 31) + rolling_hash($"t", 131) * Mod)
        val sim = simhashOf(tok.groupBy($"doc_id", $"lang"))
          .select($"doc_id", $"lang", $"simhash")
        sim.as("a").join(sim.as("b"),
            $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id")
          .withColumn("hamming", bit_count($"a.simhash".bitwiseXOR($"b.simhash")))
          .filter($"hamming" <= 8)
          .select($"a.doc_id".as("doc1"), $"b.doc_id".as("doc2"),
            $"a.lang".as("lang"), $"hamming".cast(LongType).as("hamming"))
          .orderBy($"doc1", $"doc2")
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, lang, $tokensSql AS tokens FROM documents),
        tok AS (SELECT doc_id, lang, unnest(tokens) AS t FROM toks),
        f AS (SELECT doc_id, lang,
                ${fpSql("t", 31)} + ${fpSql("t", 131)} * $Mod AS fp FROM tok),
        votes AS (
          SELECT doc_id, lang, b,
                 SUM(CASE WHEN (fp >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM f, range(60) t(b)
          GROUP BY doc_id, lang, b),
        sim AS (
          SELECT doc_id, lang,
                 SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
          FROM votes GROUP BY doc_id, lang)
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.lang AS lang,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sim a JOIN sim b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        ORDER BY doc1, doc2""")),

    // ── exact word-shingle Jaccard pairs (oracle for the LSH shortcut) ──
    "dedup_ngram_jaccard" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val docs = materialized(docsWithTokens(s, d)
            .select($"doc_id", $"lang", $"n_chars", shinglesCol.as("sh")))
          .filter(size($"sh") > 0)
        docs.as("a").join(docs.as("b"),
            $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id" &&
            abs($"a.n_chars" - $"b.n_chars") <= 50)
          .withColumn("inter", size(array_intersect($"a.sh", $"b.sh")))
          .withColumn("jaccard",
            $"inter".cast(DoubleType) /
              (size($"a.sh") + size($"b.sh") - $"inter").cast(DoubleType))
          .filter($"jaccard" >= 0.05)
          .select($"a.doc_id".as("doc1"), $"b.doc_id".as("doc2"), $"jaccard")
          .orderBy($"doc1", $"doc2")
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, lang, n_chars, $tokensSql AS tokens FROM documents),
        sh AS (
          SELECT doc_id, lang, n_chars, $shinglesSql AS sh FROM toks),
        nz AS (SELECT * FROM sh WHERE len(sh) > 0)
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 AS jaccard
        FROM nz a JOIN nz b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 50
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              >= 0.05
        ORDER BY doc1, doc2""")),

    // ── embedding-cosine near-duplicate pairs ──
    "dedup_embedding_cosine" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
          .select($"vec_id", VectorFunctions.toDoubleArray($"embedding").as("emb"))
        e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
          .withColumn("cos",
            round(VectorFunctions.cosine($"a.emb", $"b.emb"), 9))
          .filter($"cos" >= 0.35)
          .select($"a.vec_id".as("vec1"), $"b.vec_id".as("vec2"), $"cos")
          .orderBy($"vec1", $"vec2")
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS vec1, b.vec_id AS vec2,
            round(
              list_sum(list_transform(generate_series(1, len(a.emb)),
                i -> a.emb[i] * b.emb[i])) /
              (sqrt(list_sum(list_transform(a.emb, x -> x*x))) *
               sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 9) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT vec1, vec2, cos
        FROM pairs
        WHERE cos >= 0.35
        ORDER BY vec1, vec2"""))
  )
}
