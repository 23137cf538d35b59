package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * s1 is the exact baseline: brute-force cosine top-k, O(|Q|·N) — the
  * cosine is the native [[graft.functions.CosineSimilarity]] Catalyst
  * expression (whole-stage codegen, one fused loop; the zip_with/aggregate
  * HOF form it replaced is CodegenFallback — interpreted per row — and
  * produces bit-identical values, see CosineExpressionSpec). At 100 TB the
  * scale paths are s2 and s4 — the two candidate-pruning families the
  * builder prompt names: s2 is an IVF-style coarse quantizer (per-label
  * centroids) probing the nearest cells, s4 a sign-LSH bucketer (anchor
  * hyperplanes) joining bucket mates; both rerank exactly only inside the
  * pruned candidate set, turning O(Q·N) into O(Q·N/cells·probes) /
  * O(Σ bucket²). Centroid and anchor tables are tiny → broadcast; only
  * the assignment scan touches the corpus.
  */
object Similarity {

  val specs: Seq[QuerySpec] = Seq(

    // ----------------------------------------------------------------- s1
    // Brute-force cosine top-5 for 10 query vectors.
    QuerySpec(
      "s1_cosine_topk",
      (s, dir) => {
        import s.implicits._
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding".as("qv"))
        val c = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
        broadcast(q).join(c, $"query_id" =!= $"cand_id")
          .withColumn("cosine",
            round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"query_id", $"rank", $"cand_id", $"cosine")
          .orderBy($"query_id", $"rank")
      },
      Some("""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
        p AS (
          SELECT query_id, cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                          i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))), 6) AS cosine
          FROM q JOIN c ON query_id != cand_id),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ----------------------------------------------------------------- s2
    // IVF-style ANN: per-label centroids (exact decimal elementwise means →
    // deterministic doubles), assign queries to the nearest 2 cells, exact
    // rerank only within those cells. Every stage is deterministic —
    // decimal centroid sums are partition-order independent, probe and
    // rerank are pure double arithmetic — so the WHOLE approximate index
    // replays under the DuckDB oracle (same centroid math, same probe
    // ranking, same cosine); end-to-end recall vs exact s1 is asserted in
    // SimilarityRecallSpec on top.
    QuerySpec(
      "s2_ivf_ann_topk",
      (s, dir) => ivfTopK(s, dir, nQueries = 10, nProbe = 2, k = 5),
      Some(IvfTopKOracle)),

    // ---------------------------------------------------------------- s12
    // The PERSISTED-index form of s2 (VERDICT r12 #2 — the d25 move for
    // similarity search): at 100 TB the IVF index is a standing
    // artifact, not something each query batch re-derives. [[ivfIndex]]
    // stages it write-once as two parquet tables — the tiny
    // (cell, centroid) table and the corpus postings PARTITIONED BY
    // cell — and [[ivfTopKFromIndex]] serves s2's exact top-k shape
    // from it: the query batch broadcasts onto the centroid table
    // (Q·cells probe work), the router's probed-cell list statically
    // prunes the postings scan on the PARTITION column (scan-metric
    // pinned in IvfIndexSpec: partitions read = probed cells) — per
    // run the corpus is neither re-clustered nor fully scanned; cost
    // follows the query batch. The index derivation
    // is s2's deterministic decimal-mean centroid math, so the DuckDB
    // oracle (which has no standing index) replays the probe
    // row-for-row — probe ≡ inline s2 is additionally spec-pinned.
    QuerySpec(
      "s12_ivf_index_topk",
      (s, dir) => ivfTopKFromIndex(s, dir, ivfIndex(s, dir),
        nQueries = 10, nProbe = 2, k = 5),
      Some(IvfTopKOracle)),

    // ---------------------------------------------------------------- s13
    // The INCREMENTAL index append under the correctness gate — s12's
    // "append-only as vectors arrive" demonstrated, not argued (the
    // d25 move completed for similarity search). The standing half is
    // built from the corpus split alone (centroids = the quantizer a
    // real index trains once); the batch routes through that STALE
    // quantizer (nearest corpus centroid, its own label never
    // consulted) and APPENDS into the assigned cell partitions; the
    // serving probe then runs [[ivfTopKFromIndex]] UNCHANGED over the
    // appended root — batch vectors are found where the quantizer put
    // them, exactly like a vector store between retrains. Append-only
    // and idempotence are file-level spec pins (IvfIndexSpec); the
    // full oracle replays corpus-centroids → assignment → appended
    // postings → probe. At 100 TB this is the daily ingest shape:
    // batch-sized assignment work + batch-sized appended files, the
    // standing index never rewritten, the quantizer never retrained.
    QuerySpec(
      "s13_ivf_index_append",
      (s, dir) => ivfTopKFromIndex(s, dir, ivfIncIndex(s, dir),
        nQueries = 10, nProbe = 2, k = 5),
      Some(IvfIncOracle)),

    // ---------------------------------------------------------------- s14
    // The MAINTENANCE half of the s13 ingest loop: postings COMPACTION.
    // Every s13-style append lands batch-sized part files inside the
    // assigned cell partitions, so a standing index accumulates one
    // file per (batch, cell) — at 100 TB with daily ingest that is the
    // classic lakehouse small-files failure (every probe opens
    // O(appends) files per probed cell; footer/open cost swamps the
    // scan). [[ivfCompact]] is the copy-on-write fix: ONLY cells whose
    // directory is fragmented (>1 part file) are rewritten — one task
    // per cell, one output file per cell — and each cell directory is
    // swapped ATOMICALLY (old dir retired under a Spark-hidden `_` name
    // first), so a concurrent probe reads the old or the new layout,
    // never a mix; single-file cells are not even read. The pass is
    // self-describing-idempotent: a second run finds no fragmented
    // cells and touches nothing. Content is by construction identical,
    // so the s13 oracle pins the post-compaction probe row-for-row —
    // this row IS the "maintenance never changes answers" gate, with
    // the file-level invariants (1 file/cell, untouched singles,
    // byte-identical rows) pinned in IvfIndexSpec.
    QuerySpec(
      "s14_ivf_index_compact",
      (s, dir) => ivfTopKFromIndex(s, dir, ivfCompact(s, ivfIncIndex(s, dir)),
        nQueries = 10, nProbe = 2, k = 5),
      Some(IvfIncOracle)),

    // ---------------------------------------------------------------- s15
    // BINARY (sign) quantization + Hamming coarse search — the extreme
    // end of the compression ladder (s3 int8 = 4×; s5 PQ = 32× but
    // needs trained codebooks; sign-BQ = 32× with NO training: one bit
    // per dimension, the 64-dim float vector becomes two 32-bit halves
    // in BIGINTs). The coarse pass is XOR + POPCOUNT per candidate —
    // pure codegen'd integer arithmetic over an 8-byte-per-vector code
    // table that stays RAM-resident at corpus sizes where floats
    // cannot — cut by (hamming asc, cand_id), then exact cosine
    // fetches full vectors for the finalists only (the matryoshka/s7
    // two-stage shape). Sign thresholds are single-float comparisons
    // (no summation, no rounding hazard), so codes are bit-identical
    // across engines and the whole pipeline is hash-checkable;
    // SimilarityRecallSpec pins recall@k vs exact s1.
    QuerySpec(
      "s15_binary_quant_topk",
      (s, dir) => binaryQuantTopK(s, dir, nQueries = 10, cut = 50, k = 5),
      Some(BinaryQuantOracle)),

    // ---------------------------------------------------------------- s16
    // s15's code table as a STANDING ARTIFACT (VERDICT r14 #4 — the s12
    // move, completing the pattern: every ANN structure the engine
    // serves from is also demonstrated as a persisted, incrementally-
    // appended artifact). SCALING r14 showed s15's wall was the inline
    // sign-packing pass re-reading all 64 floats per vector per run;
    // the production shape packs ONCE at ingest — [[bqCodesRoot]]
    // stages the corpus split's 8-byte codes write-once, then routes
    // the batch split through the same packing and APPENDS (the s13
    // convention: standing part files byte-untouched, re-staging a
    // marker-idempotent no-op, both file-level pins in BqCodesSpec) —
    // and the serving probe reads the CODE TABLE ONLY for the coarse
    // XOR+POPCOUNT pass (spec-pinned: no embeddings scan in the coarse
    // plan; full vectors are fetched for the cut-sized finalist set
    // alone, the rerank's job). Sign codes are per-row deterministic
    // (single-float comparisons, no training state), so corpus-then-
    // append reproduces the full-table codes exactly and s15's oracle
    // pins the probe row-for-row.
    QuerySpec(
      "s16_bq_code_table_topk",
      (s, dir) => binaryQuantTopKFromCodes(s, dir, bqCodesRoot(s, dir),
        nQueries = 10, cut = 50, k = 5),
      Some(BinaryQuantOracle)),

    // ----------------------------------------------------------------- s3
    // Int8 symmetric quantization — the compression step a 100 TB vector
    // store runs before ANN serving (4× memory vs float32, 8× vs float64):
    // per-vector scale = max|x|/127, q_i = clamp(floor(x_i·127/max|x|)).
    // Entirely per-row narrow HOF work — zero shuffles, and the binary
    // vector column never moves; only the compact summary is projected.
    // floor (not round) keeps the keep/drop boundary bitwise-deterministic:
    // both engines evaluate the identical double expression tree, so the
    // oracle checks exact values, including the saturation count.
    QuerySpec(
      "s3_int8_quantize",
      (s, dir) => {
        import s.implicits._
        int8Quant(s, dir).orderBy($"vec_id")
      },
      Some("""
        WITH m AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          FROM embeddings),
        q AS (
          SELECT vec_id, maxabs, CAST(len(embedding) AS BIGINT) AS n_dims,
                 list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
                   ELSE CAST(greatest(-127.0, least(127.0,
                          floor((CAST(x AS DOUBLE) * 127.0) / maxabs))) AS BIGINT) END) AS qv
          FROM m)
        SELECT vec_id, n_dims, maxabs / 127.0 AS scale,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               list_min(qv) AS q_min,
               list_max(qv) AS q_max,
               CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
        FROM q ORDER BY vec_id""")),

    // ----------------------------------------------------------------- s4
    // Sign-LSH bucketed ANN — the second scale path the builder prompt
    // names beside IVF ("an IVF or LSH-bucketed variant"): random-
    // hyperplane signatures, except the hyperplanes are the corpus's own
    // first `nPlanes` vectors, which keeps the whole index RELATIONAL in
    // both engines (an anchor join, no literal plane tables) and fully
    // deterministic. bit_p(v) = [dot(v, anchor_p) >= 0]; bucket = Σ 2^p;
    // candidates = same-bucket pairs; exact graft_cosine rerank inside
    // the bucket only. Determinism of the SIGN (the one place 6dp
    // rounding cannot save a boundary): both engines fold the product
    // list SEQUENTIALLY in index order — Spark's aggregate() is a left
    // fold, and the oracle uses list_reduce (not list_sum, whose internal
    // summation order is unspecified) — so the dot doubles are
    // bit-identical and the sign can never diverge. At 100 TB: the
    // anchor set broadcasts (nPlanes rows), bucket build is one narrow
    // scan + a 16-row-per-vector aggregate, and the only wide stage is
    // the bucket-keyed self-join — O(Σ bucket²), the d4-band shape,
    // never all-pairs.
    QuerySpec(
      "s4_lsh_ann_topk",
      (s, dir) => lshTopK(s, dir, nPlanes = 6, nQueries = 10, k = 5),
      Some("""
        WITH a AS (SELECT vec_id AS plane, embedding AS av
                   FROM embeddings WHERE vec_id < 6),
        dots AS (
          SELECT e.vec_id, a.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(generate_series(1, len(e.embedding)),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.av[i] AS DOUBLE))),
                   (acc, x) -> acc + x) AS dot
          FROM embeddings e CROSS JOIN a),
        b AS (
          SELECT vec_id,
                 CAST(SUM(CASE WHEN dot >= 0
                               THEN CAST(pow(2, plane) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id),
        q AS (SELECT b.vec_id AS query_id, b.bucket, e.embedding AS qv
              FROM b JOIN embeddings e USING (vec_id) WHERE b.vec_id < 10),
        c AS (SELECT b.vec_id AS cand_id, b.bucket, e.embedding AS cv
              FROM b JOIN embeddings e USING (vec_id)),
        p AS (
          SELECT query_id, cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                          i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))), 6) AS cosine
          FROM q JOIN c USING (bucket) WHERE query_id != cand_id),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ----------------------------------------------------------------- s5
    // Product quantization + ADC — the third standard ANN family beside
    // IVF (s2) and LSH (s4), and the one that buys MEMORY: 64-dim float
    // vectors compress to M=8 sub-space codes (here one per 8-dim slice,
    // K=16 codes from the corpus's own first 16 vectors as the
    // deterministic codebook — the s2/s4 anchor convention that keeps the
    // whole index relational and replayable in both engines). Encode is
    // one scan against the broadcast codebook, O(N·K·M); the asymmetric-
    // distance (ADC) scan ranks candidates by table lookups over CODES
    // (M longs) instead of raw vectors — the 8× memory-bandwidth
    // compression PQ serving exists for — then the top-k winners alone
    // are refined with the exact cosine. At 100 TB, PQ composes with
    // s2's IVF cells (IVF-PQ): cells prune candidates, codes compress
    // the scan; here the families are demonstrated separately so each
    // is oracle-checked in isolation. Determinism: sub-distances fold
    // sequentially in index order (bit-identical to the oracle's
    // list_reduce), argmin tie-breaks on the lowest code via
    // min(struct(d, m)) ≡ the oracle's ROW_NUMBER ordering, and ADC
    // sums round to 6dp before ranking (the s1 precedent).
    QuerySpec(
      "s5_pq_adc_topk",
      (s, dir) => pqTopK(s, dir),
      Some("""
        WITH a AS (SELECT vec_id AS m, embedding AS av
                   FROM embeddings WHERE vec_id < 16),
        sub AS (
          SELECT e.vec_id, a.m, j,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(generate_series(1, 8),
                     i -> (CAST(e.embedding[j*8+i] AS DOUBLE)
                           - CAST(a.av[j*8+i] AS DOUBLE))
                        * (CAST(e.embedding[j*8+i] AS DOUBLE)
                           - CAST(a.av[j*8+i] AS DOUBLE)))),
                   (acc, x) -> acc + x) AS d
          FROM embeddings e, a, UNNEST(generate_series(0, 7)) AS t(j)),
        codes AS (
          SELECT vec_id AS cand_id, j, m AS code FROM (
            SELECT vec_id, j, m,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                      ORDER BY d ASC, m ASC) AS rn
            FROM sub) WHERE rn = 1),
        qd AS (SELECT vec_id AS query_id, m, j AS qj, d
               FROM sub WHERE vec_id < 10),
        adc AS (
          SELECT query_id, cand_id, ROUND(SUM(d), 6) AS adc_dist
          FROM codes JOIN qd ON qj = j AND m = code
          WHERE cand_id != query_id
          GROUP BY query_id, cand_id),
        r AS (SELECT query_id, cand_id, adc_dist,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY adc_dist ASC, cand_id) AS rank
              FROM adc),
        top AS (SELECT * FROM r WHERE rank <= 5),
        ref AS (
          SELECT t.query_id, t.rank, t.cand_id, t.adc_dist,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(q.embedding)),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
                        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)),
                          i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 6)
                   AS cosine
          FROM top t JOIN embeddings q ON q.vec_id = t.query_id
                     JOIN embeddings c ON c.vec_id = t.cand_id)
        SELECT query_id, rank, cand_id, adc_dist, cosine FROM ref
        ORDER BY query_id, rank""")),

    // ----------------------------------------------------------------- s6
    // IVF-PQ — the PRODUCTION composition of s2 and s5, the index layout
    // large-scale vector serving actually deploys: IVF cells prune the
    // candidate set (only nProbe cells per query are touched), PQ codes
    // rank the survivors by table lookup (the corpus's raw vectors never
    // enter the scan), and only the top-k winners load exact vectors for
    // the refine. Every stage reuses the oracle-verified machinery of
    // its parent operator — s2's decimal centroids + probe ranking, s5's
    // anchor codebook + argmin encode + 6dp ADC — so the composed index
    // replays end-to-end in DuckDB like both parents do. At 100 TB the
    // cost is O(Q·cells) probe + O(Q·(N/cells)·nProbe·M) code lookups +
    // O(Q·k) exact loads, with the codebook and the query distance
    // table broadcast.
    QuerySpec(
      "s6_ivfpq_topk",
      (s, dir) => ivfPqTopK(s, dir),
      Some("""
        WITH e AS (
          SELECT label, vec_id, embedding,
                 UNNEST(embedding) AS v,
                 UNNEST(range(len(embedding))) AS dim
          FROM embeddings),
        cent AS (
          SELECT label AS cell, dim,
                 CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
          FROM e GROUP BY label, dim),
        centl AS (
          SELECT cell, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cell),
        q AS (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 10),
        probe AS (
          SELECT query_id, qv, cell,
                 list_sum(list_transform(generate_series(1, len(qv)),
                   i -> (CAST(qv[i] AS DOUBLE) - centroid[i]) *
                        (CAST(qv[i] AS DOUBLE) - centroid[i]))) AS cdist
          FROM q CROSS JOIN centl),
        pr AS (
          SELECT query_id, qv, cell,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cdist ASC, cell) AS probe_rank
          FROM probe),
        probed AS (SELECT query_id, cell FROM pr WHERE probe_rank <= 2),
        a AS (SELECT vec_id AS m, embedding AS av
              FROM embeddings WHERE vec_id < 16),
        sub AS (
          SELECT e2.vec_id, a.m, j,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(generate_series(1, 8),
                     i -> (CAST(e2.embedding[j*8+i] AS DOUBLE)
                           - CAST(a.av[j*8+i] AS DOUBLE))
                        * (CAST(e2.embedding[j*8+i] AS DOUBLE)
                           - CAST(a.av[j*8+i] AS DOUBLE)))),
                   (acc, x) -> acc + x) AS d
          FROM embeddings e2, a, UNNEST(generate_series(0, 7)) AS t(j)),
        codes AS (
          SELECT vec_id AS cand_id, j, m AS code FROM (
            SELECT vec_id, j, m,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                      ORDER BY d ASC, m ASC) AS rn
            FROM sub) WHERE rn = 1),
        qd AS (SELECT vec_id AS query_id, m, j AS qj, d
               FROM sub WHERE vec_id < 10),
        cand AS (
          SELECT p.query_id, c.vec_id AS cand_id
          FROM probed p JOIN embeddings c ON c.label = p.cell
          WHERE c.vec_id != p.query_id),
        adc AS (
          SELECT cand.query_id, cand.cand_id,
                 ROUND(SUM(qd.d), 6) AS adc_dist
          FROM cand
          JOIN codes ON codes.cand_id = cand.cand_id
          JOIN qd ON qd.query_id = cand.query_id
                 AND qd.qj = codes.j AND qd.m = codes.code
          GROUP BY cand.query_id, cand.cand_id),
        r AS (SELECT query_id, cand_id, adc_dist,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY adc_dist ASC, cand_id) AS rank
              FROM adc),
        top AS (SELECT * FROM r WHERE rank <= 5),
        ref AS (
          SELECT t.query_id, t.rank, t.cand_id, t.adc_dist,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(q2.embedding)),
                     i -> CAST(q2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(q2.embedding)),
                        i -> CAST(q2.embedding[i] AS DOUBLE) * CAST(q2.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(c2.embedding)),
                          i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 6)
                   AS cosine
          FROM top t JOIN embeddings q2 ON q2.vec_id = t.query_id
                     JOIN embeddings c2 ON c2.vec_id = t.cand_id)
        SELECT query_id, rank, cand_id, adc_dist, cosine FROM ref
        ORDER BY query_id, rank""")),

    // ----------------------------------------------------------------- s7
    // Truncated-dimension (Matryoshka-style) two-stage retrieval — see
    // [[matryoshkaTopK]]. The fifth ANN family: prune by DIMENSIONS
    // where s2 prunes by cells, s4 by hyperplane buckets, s5/s6 by
    // codes. Fully deterministic (prefix dots round to 6 dp before the
    // cut, cand_id tiebreaks), so the two-stage index replays exactly
    // under the oracle.
    QuerySpec(
      "s7_matryoshka_topk",
      (s, dir) => matryoshkaTopK(s, dir),
      Some("""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 list_slice(embedding, 1, 8) AS qp
          FROM embeddings WHERE vec_id < 10),
        c AS (
          SELECT vec_id AS cand_id, list_slice(embedding, 1, 8) AS cp
          FROM embeddings),
        coarse AS (
          SELECT query_id, cand_id,
                 ROUND(list_sum(list_transform(generate_series(1, 8),
                   i -> CAST(qp[i] AS DOUBLE) * CAST(cp[i] AS DOUBLE))), 6)
                   AS cdot
          FROM q JOIN c ON query_id != cand_id),
        cutq AS (
          SELECT query_id, cand_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cdot DESC, cand_id) AS crank
          FROM coarse),
        ref AS (
          SELECT t.query_id, t.cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(q2.embedding)),
                     i -> CAST(q2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(q2.embedding)),
                        i -> CAST(q2.embedding[i] AS DOUBLE) * CAST(q2.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(c2.embedding)),
                          i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 6)
                   AS cosine
          FROM cutq t JOIN embeddings q2 ON q2.vec_id = t.query_id
                      JOIN embeddings c2 ON c2.vec_id = t.cand_id
          WHERE t.crank <= 50),
        top AS (
          SELECT query_id, cand_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, cand_id) AS rank
          FROM ref)
        SELECT query_id, rank, cand_id, cosine FROM top WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ----------------------------------------------------------------- s8
    // Bulk KNN-join (knn-graph construction) — EVERY vector retrieves
    // its top-3 neighbours, not a 10-query probe set: the all-corpus
    // self-retrieval semantic-dedup and clustering pipelines (d8's edge
    // generation, SemDeDup) actually run at scale. Candidates are BLOCK
    // mates under the composite (IVF cell × sign-LSH bucket) key — see
    // [[knnJoin]] for why composite blocking (pair volume n·blocksize,
    // planes the log-n knob) replaced the first-cut cell probing whose
    // candidate set stayed a constant fraction of the corpus and
    // measured quadratic. Deterministic end-to-end (anchor-dot signs,
    // 6-dp rounds, id tiebreaks), so the full graph replays under the
    // oracle.
    QuerySpec(
      "s8_knn_join",
      (s, dir) => knnJoin(s, dir),
      Some("""
        WITH a AS (SELECT vec_id AS plane, embedding AS av
                   FROM embeddings WHERE vec_id < 6),
        dots AS (
          SELECT e.vec_id, a.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(generate_series(1, len(e.embedding)),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.av[i] AS DOUBLE))),
                   (acc, x) -> acc + x) AS dot
          FROM embeddings e CROSS JOIN a),
        b AS (
          SELECT vec_id,
                 CAST(SUM(CASE WHEN dot >= 0
                               THEN CAST(pow(2, plane) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id),
        q AS (SELECT b.vec_id AS query_id, e.label, b.bucket,
                     e.embedding AS qv
              FROM b JOIN embeddings e USING (vec_id)),
        c AS (SELECT b.vec_id AS cand_id, e.label, b.bucket,
                     e.embedding AS cv
              FROM b JOIN embeddings e USING (vec_id)),
        p AS (
          SELECT query_id, cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                          i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))), 6) AS cosine
          FROM q JOIN c USING (label, bucket)
          WHERE query_id != cand_id),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 3
        ORDER BY query_id, rank""")),

    // ----------------------------------------------------------------- s9
    // FILTERED (hybrid) ANN — vector search under a metadata predicate,
    // the vector-database shape every RAG/curation deployment actually
    // runs ("nearest English documents over 200 chars", not nearest
    // anything): candidates are PRE-FILTERED by a semi-join against the
    // metadata table BEFORE any distance math, then exact cosine top-k
    // runs over the survivors. Pre- vs post-filter is the classic
    // hybrid-search tradeoff: post-filtering top-k' > k results breaks
    // recall when the predicate is selective (a 28%-selective filter
    // leaves k'·0.28 survivors), while the pre-filter semi-join is an
    // equi-key hash join whose cost tracks the candidate stream and
    // never touches vector arithmetic for excluded rows. The doc
    // metadata joins on the shared id space (vec_id = doc_id).
    // Scale: the semi-join composes unchanged with the bucketed
    // generators — at 100 TB the same predicate joins s2's probed cells
    // or s4's hash buckets instead of the full corpus; the filter is a
    // property of the CANDIDATE STREAM, not of this brute-force
    // baseline. Distances ride the codegen'd graft_cosine kernel.
    QuerySpec(
      "s9_filtered_ann",
      (s, dir) => {
        import s.implicits._
        val emb = Tables(s, dir, "embeddings")
        val keep = Tables(s, dir, "documents")
          .filter($"lang" === "en" && $"n_chars" >= 200L)
          .select($"doc_id".as("cand_id"))
        val q = emb.filter($"vec_id" < 10)
          .select($"vec_id".as("query_id"), $"embedding".as("qv"))
        val c = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
          .join(keep, Seq("cand_id"), "left_semi")
        val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
        broadcast(q).join(c, $"query_id" =!= $"cand_id")
          .withColumn("cosine",
            round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"query_id", $"rank", $"cand_id", $"cosine")
          .orderBy($"query_id", $"rank")
      },
      Some("""
        WITH keep AS (
          SELECT doc_id AS cand_id FROM documents
          WHERE lang = 'en' AND n_chars >= 200),
        q AS (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
              WHERE vec_id IN (SELECT cand_id FROM keep)),
        p AS (
          SELECT query_id, cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                          i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))), 6) AS cosine
          FROM q JOIN c ON query_id != cand_id),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---------------------------------------------------------------- s10
    // Hybrid retrieval via Reciprocal Rank Fusion (k=60, the published
    // constant): fuse t17's BM25 text ranking with a vector ranking for
    // the same information need — the standard production shape where a
    // lexical index and an ANN index answer in parallel and
    // score = sum over lists of 1/(60 + rank). RRF needs only RANKS, so
    // the two retrievers stay fully independent (no score calibration),
    // which is exactly why it composes at 100 TB: each side runs its own
    // scale path (t17's term-filtered scan; s2/s4's bucketed candidates)
    // and the fusion join touches 2·k rows, driver-trivial but kept
    // distributed here. Rank assignment happens AFTER each side's top-k
    // cut (TakeOrderedAndProject), so the rank windows run over <= 20
    // rows by construction — never a corpus-wide single-partition sort.
    // Docs ranked by one list only still fuse (full outer, missing side
    // contributes 0) — the RRF property that surfaces strong
    // single-modality hits.
    QuerySpec(
      "s10_rrf_fusion",
      (s, dir) => {
        import s.implicits._
        val emb = Tables(s, dir, "embeddings")
        val textTop = TextAnalysis.bm25Scores(s, dir, Seq("join", "vector", "window"))
          .orderBy($"bm25".desc, $"doc_id").limit(20)
          .withColumn("text_rank",
            row_number().over(Window.orderBy($"bm25".desc, $"doc_id")))
          .select($"doc_id", $"text_rank")
        val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
        val vecTop = emb.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id".as("doc_id"),
            round(graft.functions.GraftFunctions.cosineSim($"qv", $"embedding"), 6)
              .as("cosine"))
          .orderBy($"cosine".desc, $"doc_id").limit(20)
          .withColumn("vec_rank",
            row_number().over(Window.orderBy($"cosine".desc, $"doc_id")))
          .select($"doc_id", $"vec_rank")
        textTop.join(vecTop, Seq("doc_id"), "full_outer")
          .select($"doc_id", $"text_rank", $"vec_rank",
            round(
              coalesce(lit(1.0) / (lit(60) + $"text_rank"), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60) + $"vec_rank"), lit(0.0)), 6).as("rrf"))
          .orderBy($"rrf".desc, $"doc_id")
          .limit(20)
      },
      Some(raw"""
        WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents WHERE text IS NOT NULL),
        dl AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        tfq AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MIN(dl) AS dl
          FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
          WHERE term IN ('join', 'vector', 'window')
          GROUP BY doc_id, term),
        dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY term),
        sc AS (
          SELECT t.doc_id,
                 ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl)) AS w
          FROM tfq t JOIN dfq f USING (term), stats s),
        bm AS (SELECT doc_id, ROUND(SUM(w), 6) AS bm25 FROM sc GROUP BY doc_id),
        ttop AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
        tr AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS text_rank
               FROM ttop),
        qv0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        vs AS (
          SELECT vec_id AS doc_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
                          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))),
                   6) AS cosine
          FROM embeddings, qv0 WHERE vec_id != 0),
        vtop AS (SELECT doc_id, cosine FROM vs ORDER BY cosine DESC, doc_id LIMIT 20),
        vr AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
               FROM vtop)
        SELECT doc_id, text_rank, vec_rank,
               ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + text_rank), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + vec_rank), 0), 6) AS rrf
        FROM tr FULL OUTER JOIN vr USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT 20""")),

    // ---------------------------------------------------------------- s11
    // K-means training (Lloyd's algorithm, k=8, two iterations) — the
    // step s2's IVF index TAKES AS GIVEN: s2 reads its coarse cells from
    // the label column; a real 100 TB vector store has no labels, it
    // TRAINS the cell centroids. Every iteration is the canonical
    // broadcast-kmeans shape: the k-row centroid frame broadcasts onto
    // the stationary vector scan (the s2 centroid-cross whitelist
    // pattern), assignment is a per-vector argmin over k candidates
    // (window over k rows), and the update is one (cid, dim) aggregate —
    // nothing corpus-sized ever shuffles except that node-keyed update.
    // Determinism — the reason this trains on an INTEGER GRID: float
    // centroid means are partition-order-dependent, so coordinates are
    // mapped once to exact BIGINT micro-units (floor(x·1e6); float→
    // double cast is exact), distances are exact integer sums, ties
    // break by lowest cid, and the centroid update floors the exact
    // mean (sums ≪ 2^53, so the double division is exact before floor).
    // The whole 2-round trainer therefore replays bit-identically under
    // the unrolled DuckDB oracle — the d13/x7 move applied to clustering.
    // Seeds are the k lowest vec_ids (a k-row window; kmeans|| sampling
    // is the lake-scale seeding, same loop thereafter). Clusters that
    // lose every member drop out (both engines identically).
    QuerySpec(
      "s11_kmeans_train",
      (s, dir) => {
        import s.implicits._
        val (grid, cent, assigned) = kmeansCore(s, dir)
        val sizes = assigned.groupBy($"cid").agg(count(lit(1)).as("n_members"))
        val out = cent.join(sizes, "cid")
          .select($"cid".as("cluster_id"), $"n_members",
            md5(expr("array_join(transform(cg, x -> CAST(x AS STRING)), ',')"))
              .as("centroid_fp"),
            expr("aggregate(cg, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("centroid_sum"))
          .orderBy($"cluster_id")
        graft.Materialize.thenRelease(out, grid)
      },
      Some(KmeansCteSql + """
        sz AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members
               FROM a2 GROUP BY cid)
        SELECT c2.cid AS cluster_id, sz.n_members,
               md5(array_to_string(c2.cg, ',')) AS centroid_fp,
               CAST(list_sum(c2.cg) AS BIGINT) AS centroid_sum
        FROM c2 JOIN sz USING (cid) ORDER BY cluster_id""")),

    // ---------------------------------------------------------------- e5
    // ANN index build — the similarity plane's composed capstone (the
    // e1/e4 move for vectors): s11's trained centroids + the FINAL
    // posting-list assignment every vector gets in a real IVF index +
    // s3's int8 compression stats, rolled up per cell. This is the
    // artifact a 100 TB vector store persists — cell sizes (the probe
    // cost model), total within-cell distance (the index quality
    // metric), and the quantization saturation the serving tier needs to
    // budget requantization. Same plan shapes as its parents: k-row
    // centroid crosses, map-side quantization, one (vec → cell) keyed
    // rollup. total_dist stays an exact BIGINT on the integer grid;
    // avg_scale sums nano-scaled BIGINTs (order-free exact) and divides
    // once at the end, then rounds 6dp (t16's rule).
    QuerySpec(
      "e5_index_build",
      (s, dir) => {
        import s.implicits._
        val (grid, cent, _) = kmeansCore(s, dir)
        val byVec = Window.partitionBy($"vec_id").orderBy($"dist", $"cid")
        val a3 = grid.crossJoin(broadcast(cent))
          .withColumn("dist", expr(KmeansDistExpr))
          .withColumn("rk", row_number().over(byVec))
          .filter($"rk" === 1)
          .select($"vec_id", $"cid", $"dist")
        val quant = int8Quant(s, dir).select($"vec_id", $"scale", $"n_sat")
        val out = a3.join(quant, "vec_id")
          .groupBy($"cid")
          .agg(
            count(lit(1)).as("n_vecs"),
            sum($"dist").as("total_dist"),
            sum($"n_sat").as("n_saturated"),
            // avg over raw doubles is partition-order-dependent; the
            // repo's average discipline instead: one exact BIGINT sum
            // of per-row nano-scaled values, one final double division.
            sum(round($"scale" * 1e9).cast("long")).as("scale_nano"))
          .withColumn("avg_scale",
            round($"scale_nano".cast("double") / ($"n_vecs" * 1e9), 6))
          .select($"cid".as("cluster_id"), $"n_vecs", $"total_dist",
            $"n_saturated", $"avg_scale")
          .orderBy($"cluster_id")
        graft.Materialize.thenRelease(out, grid)
      },
      Some(KmeansCteSql + """
        a3 AS (
          SELECT vec_id, cid, dist FROM (
            SELECT grid.vec_id, c2.cid,
                   list_sum(list_transform(generate_series(1, len(grid.g)),
                     i -> (grid.g[i] - c2.cg[i]) * (grid.g[i] - c2.cg[i]))) AS dist,
                   ROW_NUMBER() OVER (PARTITION BY grid.vec_id ORDER BY
                     list_sum(list_transform(generate_series(1, len(grid.g)),
                       i -> (grid.g[i] - c2.cg[i]) * (grid.g[i] - c2.cg[i]))),
                     c2.cid) AS rk
            FROM grid CROSS JOIN c2) WHERE rk = 1),
        qm AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          FROM embeddings),
        quant AS (
          SELECT vec_id, maxabs / 127.0 AS scale,
                 CAST(len(list_filter(
                   list_transform(embedding,
                     x -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
                          ELSE CAST(greatest(-127.0, least(127.0,
                                 floor((CAST(x AS DOUBLE) * 127.0) / maxabs)))
                               AS BIGINT) END),
                   q -> abs(q) = 127)) AS BIGINT) AS n_sat
          FROM qm)
        SELECT a3.cid AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(a3.dist) AS BIGINT) AS total_dist,
               CAST(SUM(quant.n_sat) AS BIGINT) AS n_saturated,
               ROUND(CAST(SUM(CAST(round(quant.scale * 1000000000.0) AS BIGINT))
                     AS DOUBLE) / (COUNT(*) * 1000000000.0), 6) AS avg_scale
        FROM a3 JOIN quant USING (vec_id)
        GROUP BY a3.cid ORDER BY cluster_id"""))
  )

  /** s3's quantization frame, shared with e5: per vector the int8
    * symmetric-quantization summary (scale = max|x|/127,
    * q_i = clamp(floor(x_i·127/max|x|)) — floor, not round, keeps every
    * boundary bitwise-deterministic). Pure narrow HOF work, zero
    * shuffles; callers add their own ordering/rollup. */
  private def int8Quant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "embeddings")
      .withColumn("maxabs",
        array_max(transform($"embedding", x => abs(x.cast("double")))))
      .withColumn("qv", expr(
        """transform(embedding, x -> CASE WHEN maxabs = 0D THEN CAST(0 AS BIGINT)
          |  ELSE CAST(greatest(-127.0D, least(127.0D,
          |         floor((CAST(x AS DOUBLE) * 127.0D) / maxabs))) AS BIGINT) END)""".stripMargin))
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("n_dims"),
        ($"maxabs" / 127.0).as("scale"),
        expr("aggregate(qv, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
        array_min($"qv").as("q_min"),
        array_max($"qv").as("q_max"),
        expr("CAST(size(filter(qv, x -> abs(x) = 127)) AS BIGINT)").as("n_sat"))
  }

  /** The exact integer squared distance between a vector's grid `g` and
    * a candidate centroid `cg` — s11/e5's assignment metric. */
  private def KmeansDistExpr: String =
    "aggregate(zip_with(g, cg, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0 AS BIGINT), (acc, e) -> acc + e)"

  /** s11's trainer core, shared with e5: maps the embeddings onto the
    * exact BIGINT micro-unit grid (floor(x·1e6)), seeds k=8 centroids
    * from the lowest vec_ids, and runs two Lloyd rounds — per round one
    * broadcast centroid cross + per-vector argmin window (k rows per
    * vector) + one (cid, dim) update aggregate, each round eagerly
    * checkpointed (the d7 constant-plan convention). Returns
    * (grid [persisted — caller must release], final centroids
    * (cid, cg), last assignment (vec_id, cid, g)). */
  private def kmeansCore(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val k = 8
    val grid = Tables(s, dir, "embeddings")
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0D) AS BIGINT))")
        .as("g"))
      .persist()
    val seedW = Window.orderBy($"vec_id") // k-row frame only
    var cent = grid.orderBy($"vec_id").limit(k)
      .withColumn("cid", row_number().over(seedW).cast("long") - 1L)
      .select($"cid", $"g".as("cg"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"dist", $"cid")
    var assigned = grid // placeholder; set in round 1
    for (_ <- 1 to 2) {
      assigned = grid.crossJoin(broadcast(cent))
        .withColumn("dist", expr(KmeansDistExpr))
        .withColumn("rk", row_number().over(byVec))
        .filter($"rk" === 1)
        .select($"vec_id", $"cid", $"g")
        .localCheckpoint(true)
      cent = assigned
        .select($"cid", posexplode($"g").as(Seq("d", "v")))
        .groupBy($"cid", $"d")
        .agg(floor(sum($"v").cast("double") / count(lit(1)))
          .cast("long").as("c"))
        .groupBy($"cid")
        .agg(expr("transform(array_sort(collect_list(struct(d, c))), s -> s.c)")
          .as("cg"))
        .localCheckpoint(true)
    }
    (grid, cent, assigned)
  }

  /** The shared oracle prefix for s11/e5: the grid mapping, the k=8
    * lowest-vec_id seeds, and both unrolled Lloyd rounds (assignment
    * argmin + floored-mean update), ending at `c2`/`a2` with a trailing
    * comma so callers append their own final CTEs/select. */
  private def KmeansCteSql: String = """
        WITH grid AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS g
          FROM embeddings),
        c0 AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
                 g AS cg
          FROM (SELECT vec_id, g FROM grid ORDER BY vec_id LIMIT 8)),
        a1 AS (
          SELECT vec_id, cid, g FROM (
            SELECT grid.vec_id, c0.cid, grid.g,
                   ROW_NUMBER() OVER (PARTITION BY grid.vec_id ORDER BY
                     list_sum(list_transform(generate_series(1, len(grid.g)),
                       i -> (grid.g[i] - c0.cg[i]) * (grid.g[i] - c0.cg[i]))),
                     c0.cid) AS rk
            FROM grid CROSS JOIN c0) WHERE rk = 1),
        m1 AS (
          SELECT cid, d, CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS c
          FROM (SELECT cid, UNNEST(g) AS v, UNNEST(range(len(g))) AS d FROM a1)
          GROUP BY cid, d),
        c1 AS (SELECT cid, list(c ORDER BY d) AS cg FROM m1 GROUP BY cid),
        a2 AS (
          SELECT vec_id, cid, g FROM (
            SELECT grid.vec_id, c1.cid, grid.g,
                   ROW_NUMBER() OVER (PARTITION BY grid.vec_id ORDER BY
                     list_sum(list_transform(generate_series(1, len(grid.g)),
                       i -> (grid.g[i] - c1.cg[i]) * (grid.g[i] - c1.cg[i]))),
                     c1.cid) AS rk
            FROM grid CROSS JOIN c1) WHERE rk = 1),
        m2 AS (
          SELECT cid, d, CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS c
          FROM (SELECT cid, UNNEST(g) AS v, UNNEST(range(len(g))) AS d FROM a2)
          GROUP BY cid, d),
        c2 AS (SELECT cid, list(c ORDER BY d) AS cg FROM m2 GROUP BY cid),"""

  /** IVF search: coarse cells = `label`, probe the `nProbe` nearest
    * centroids per query, exact cosine rerank within probed cells. */
  def ivfTopK(s: SparkSession, dir: String, nQueries: Int, nProbe: Int, k: Int): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val probed = ivfProbe(s, dir, nQueries, nProbe)
    // Exact rerank within probed cells only.
    val cands = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"), $"label".as("cell"))
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    probed.join(cands, Seq("cell"))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** PQ + ADC search (s5): deterministic anchor codebook → per-subspace
    * argmin encode → asymmetric-distance candidate ranking over codes →
    * exact cosine refine of the winners. See the s5 QuerySpec scaladoc
    * for the determinism and 100 TB rationale. */
  def pqTopK(s: SparkSession, dir: String, nAnchors: Int = 16, nSub: Int = 8,
             subDim: Int = 8, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val sub = pqSubDistances(s, dir, nAnchors, nSub, subDim)
    // argmin with lowest-code tie-break: struct ordering is (d, m) lex
    val codes = sub.groupBy($"vec_id", $"j")
      .agg(min(struct($"d", $"m")).getField("m").as("code"))
      .select($"vec_id".as("cand_id"), $"j", $"code")
    // the queries' distance table is tiny (Q·K·M rows) — broadcast it so
    // the ADC join never shuffles the corpus-sized code table
    val qd = sub.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"m", $"j".as("qj"), $"d")
    val wTop = Window.partitionBy($"query_id").orderBy($"adc_dist".asc, $"cand_id")
    val top = codes.join(broadcast(qd), $"qj" === $"j" && $"m" === $"code")
      .filter($"cand_id" =!= $"query_id")
      .groupBy($"query_id", $"cand_id")
      .agg(round(sum($"d"), 6).as("adc_dist"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
    // exact refine on the k winners only
    val qv = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val cv = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
    top.join(broadcast(qv), "query_id").join(cv, "cand_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .select($"query_id", $"rank", $"cand_id", $"adc_dist", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** IVF-PQ (s6): s2's cell probe prunes candidates, s5's codes rank
    * them, exact cosine refines the winners. See the s6 QuerySpec
    * scaladoc. */
  def ivfPqTopK(s: SparkSession, dir: String, nQueries: Int = 10,
                nProbe: Int = 2, nAnchors: Int = 16, nSub: Int = 8,
                subDim: Int = 8, k: Int = 5): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val probed = ivfProbe(s, dir, nQueries, nProbe).select($"query_id", $"cell")
    val sub = pqSubDistances(s, dir, nAnchors, nSub, subDim)
    val codes = sub.groupBy($"vec_id", $"j")
      .agg(min(struct($"d", $"m")).getField("m").as("code"))
      .select($"vec_id".as("cand_id"), $"j", $"code")
    val qd = sub.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"m", $"j".as("qj"), $"d")
    val cand = probed
      .join(emb.select($"vec_id".as("cand_id"), $"label".as("cell")), Seq("cell"))
      .filter($"cand_id" =!= $"query_id")
      .select($"query_id", $"cand_id")
    val wTop = Window.partitionBy($"query_id").orderBy($"adc_dist".asc, $"cand_id")
    val top = cand
      .join(codes, Seq("cand_id"))
      .join(broadcast(qd),
        qd("query_id") === cand("query_id") &&
          $"qj" === $"j" && $"m" === $"code")
      .groupBy(cand("query_id").as("query_id"), $"cand_id")
      .agg(round(sum($"d"), 6).as("adc_dist"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
    val qv = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val cv = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
    top.join(broadcast(qv), "query_id").join(cv, "cand_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .select($"query_id", $"rank", $"cand_id", $"adc_dist", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** s8: bulk KNN-join (knn-graph construction) — every vector finds
    * its top-`k` neighbours among its BLOCK mates, where the block key
    * composes the IVF cell (label) with the [[lshTopK]] sign-bucket:
    * cells × 2^nPlanes blocks, so block population — and with it the
    * per-vector candidate count — is n/(cells·2^nPlanes). That makes
    * the self-join's pair volume n·blocksize with nPlanes as the knob
    * that grows with log n at scale, the same banding argument d4 makes
    * for MinHash. A first cut that probed nProbe IVF cells per vector
    * kept the candidate set a CONSTANT FRACTION of the corpus
    * (n²·nProbe/cells pairs — measured 24× wall for 10× vectors, the
    * d5 signature); composite blocking replaced it and the measured
    * slope dropped to ~2× (SCALING.md). Vectors alone in their block
    * emit no rows — the recall/coverage tradeoff every blocked
    * knn-graph build makes, pinned by spec. */
  def knnJoin(s: SparkSession, dir: String, nPlanes: Int = 6,
              k: Int = 3): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val anchors = emb.filter($"vec_id" < nPlanes)
      .select($"vec_id".as("plane"), $"embedding".as("av"))
    val buckets = emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(anchors))
      .withColumn("dot",
        graft.functions.GraftFunctions.dot($"embedding", $"av"))
      .groupBy($"vec_id")
      .agg(sum(when($"dot" >= 0,
          pow(lit(2.0), $"plane".cast("double")).cast("long"))
        .otherwise(0L)).as("bucket"))
    val blocked = buckets
      .join(emb.select($"vec_id", $"label", $"embedding"), "vec_id")
    val q = blocked.select($"vec_id".as("query_id"), $"label", $"bucket",
      $"embedding".as("qv"))
    val c = blocked.select($"vec_id".as("cand_id"), $"label", $"bucket",
      $"embedding".as("cv"))
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    q.join(c, Seq("label", "bucket"))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** s2's cell-probe stage, factored out so s6 can reuse it: decimal
    * elementwise-mean centroids (partition-order independent), nearest
    * `nProbe` cells per query by squared distance (broadcast centroid
    * table, O(Q·cells)). Returns (query_id, qv, cell). */
  def ivfProbe(s: SparkSession, dir: String, nQueries: Int,
               nProbe: Int): DataFrame = {
    import s.implicits._
    val queries = Tables(s, dir, "embeddings").filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    probeCells(queries, ivfCentroids(s, dir), nProbe)
  }

  /** s2's centroid derivation, factored so s12's standing index stages
    * the SAME frame: elementwise mean per label cell. Decimal sums make
    * the centroid exactly reproducible regardless of partition/merge
    * order — which is what lets the staged parquet copy and the
    * oracle's inline derivation agree bit-for-bit. */
  private[graft] def ivfCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "embeddings")
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      .agg((sum($"v".cast("decimal(28,12)")).cast("double") / count(lit(1))).as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"dim", $"c"))).as("pairs"))
      .select($"label".as("cell"), expr("transform(pairs, p -> p.c)").as("centroid"))
  }

  /** Probe assignment against an ARBITRARY (cell, centroid) frame — the
    * piece s2 (inline centroids) and s12 (centroids read from the
    * standing index) share: nearest `nProbe` cells per query by squared
    * distance; the centroid table is tiny — broadcast; cost O(Q·cells).
    * Returns (query_id, qv, cell). */
  private def probeCells(queries: DataFrame, centroids: DataFrame,
                         nProbe: Int): DataFrame = {
    import queries.sparkSession.implicits._
    val wProbe = Window.partitionBy($"query_id").orderBy($"cdist".asc, $"cell")
    queries.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        graft.functions.GraftFunctions.l2sq($"qv", $"centroid"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter($"probe_rank" <= nProbe)
      .select($"query_id", $"qv", $"cell")
  }

  /** s12's STANDING IVF INDEX — the persisted artifact a 100 TB vector
    * store probes instead of re-deriving the index per query batch (the
    * d25 semanticIndex convention applied to similarity search). Two
    * write-once parquet tables under `data/ivfidx_<sf>/`:
    *  - `centroids/` — (cell, centroid): [[ivfCentroids]]' tiny
    *    decimal-mean table, the probe stage's broadcast side;
    *  - `postings/` — (cand_id, cv) PARTITIONED BY cell: the corpus
    *    bucketed by its coarse cell, laid out so a probe's cell keys
    *    prune the SCAN (directory-level partition pruning), not just
    *    the join. Append-only in production as vectors arrive; the
    *    fixture form rebuilds only when the source parquet fingerprint
    *    drifts. Returns the index root path. */
  private[graft] def ivfIndex(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new java.io.File(sys.props.getOrElse("graft.fixture.dir",
      sys.props("user.dir") + "/data"))
    val base = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = new java.io.File(root, "ivfidx_" + base)
    if (verifiedIvfIndexes.contains(path.getAbsolutePath))
      return path.getAbsolutePath
    val stamp = s"v1:ivf-label-cells:${Multimodal.sourceFingerprint(
      new java.io.File(dir, "embeddings.parquet"))}"
    val marker = new java.io.File(path.getAbsolutePath + ".staged")
    val upToDate = path.isDirectory && marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp
    if (!upToDate) {
      ivfCentroids(s, dir).write.mode("overwrite")
        .parquet(new java.io.File(path, "centroids").getAbsolutePath)
      Tables(s, dir, "embeddings")
        .select($"vec_id".as("cand_id"), $"embedding".as("cv"),
          $"label".as("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(new java.io.File(path, "postings").getAbsolutePath)
      java.nio.file.Files.write(marker.toPath, stamp.getBytes)
      ()
    }
    verifiedIvfIndexes.add(path.getAbsolutePath)
    path.getAbsolutePath
  }

  private val verifiedIvfIndexes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** s13's INCREMENTAL index — the append path a standing IVF index
    * actually runs in production, where s12's "append-only as vectors
    * arrive" was prose (the d25→d12 incremental symmetry applied to
    * similarity search). Two halves, split so IvfIndexSpec can observe
    * the filesystem between them:
    *  - [[ivfIncCorpus]] stages the STANDING half from the corpus
    *    split alone (vec_id % 5 != 0, d25's convention): centroids
    *    derived from corpus vectors only — the quantizer a real index
    *    trains once and does NOT retrain per batch — and corpus
    *    postings partitioned by cell (= label);
    *  - [[ivfIncAppend]] routes the incoming batch (vec_id % 5 == 0)
    *    through the STALE quantizer — nearest corpus centroid by the
    *    same argmin the probe uses, the batch's own label is never
    *    consulted — and APPENDS the routed rows into the assigned cell
    *    partitions. Append-only is spec-pinned at the file level: the
    *    standing part files are byte-untouched, new files land only
    *    under assigned cells, and a second append is a no-op (marker-
    *    idempotent, so a re-run never duplicates postings).
    * The s13 probe then serves [[ivfTopKFromIndex]] unchanged from the
    * appended root — batch vectors are found in the cells the stale
    * quantizer put them in, exactly like a vector store between
    * retrains. Every stage is the deterministic s2 arithmetic, so the
    * full DuckDB oracle replays corpus-centroids → batch assignment →
    * appended postings → probe row-for-row. */
  private[graft] def ivfIncCorpus(s: SparkSession, dir: String,
                                  rootOverride: Option[java.io.File] = None)
      : String = {
    import s.implicits._
    val root = rootOverride.getOrElse(
      new java.io.File(sys.props.getOrElse("graft.fixture.dir",
        sys.props("user.dir") + "/data")))
    val base = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = new java.io.File(root, "ivfinc_" + base)
    val stamp = s"v1:ivf-inc-corpus:${Multimodal.sourceFingerprint(
      new java.io.File(dir, "embeddings.parquet"))}"
    val marker = new java.io.File(path.getAbsolutePath + ".staged")
    val upToDate = path.isDirectory && marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp
    if (!upToDate) {
      // a stale corpus restage invalidates any prior append
      val aMarker = new java.io.File(path.getAbsolutePath + ".appended")
      java.nio.file.Files.deleteIfExists(aMarker.toPath)
      val corpus = Tables(s, dir, "embeddings").filter($"vec_id" % 5 =!= 0)
      corpus
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim")
        .agg((sum($"v".cast("decimal(28,12)")).cast("double") / count(lit(1))).as("c"))
        .groupBy($"label")
        .agg(array_sort(collect_list(struct($"dim", $"c"))).as("pairs"))
        .select($"label".as("cell"), expr("transform(pairs, p -> p.c)").as("centroid"))
        .write.mode("overwrite")
        .parquet(new java.io.File(path, "centroids").getAbsolutePath)
      corpus
        .select($"vec_id".as("cand_id"), $"embedding".as("cv"),
          $"label".as("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(new java.io.File(path, "postings").getAbsolutePath)
      java.nio.file.Files.write(marker.toPath, stamp.getBytes)
      ()
    }
    path.getAbsolutePath
  }

  /** Route the batch through the STALE quantizer and append into the
    * assigned cell partitions — see [[ivfIncCorpus]]. Idempotent per
    * fixture fingerprint. Returns the index root. */
  private[graft] def ivfIncAppend(s: SparkSession, dir: String,
                                  indexRoot: String): String = {
    import s.implicits._
    val stamp = s"v1:ivf-inc-append:${Multimodal.sourceFingerprint(
      new java.io.File(dir, "embeddings.parquet"))}"
    val marker = new java.io.File(indexRoot + ".appended")
    val done = marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp
    if (!done) {
      val centroids = s.read.parquet(
        new java.io.File(indexRoot, "centroids").getAbsolutePath)
      val batch = Tables(s, dir, "embeddings").filter($"vec_id" % 5 === 0)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      // nProbe=1 probe IS the assignment argmin (same arithmetic the
      // serving probe uses, cell tie-break included)
      probeCells(batch, centroids, nProbe = 1)
        .select($"query_id".as("cand_id"), $"qv".as("cv"), $"cell")
        .write.mode("append").partitionBy("cell")
        .parquet(new java.io.File(indexRoot, "postings").getAbsolutePath)
      java.nio.file.Files.write(marker.toPath, stamp.getBytes)
      ()
    }
    indexRoot
  }

  /** The composed staging s13 runs: standing corpus index + the
    * batch append, once each per fixture fingerprint. */
  private[graft] def ivfIncIndex(s: SparkSession, dir: String): String =
    ivfIncCompactGuard.synchronized { ivfIncAppend(s, dir, ivfIncCorpus(s, dir)) }

  /** Serializes [[ivfCompact]] against [[ivfIncAppend]] on the shared
    * fixture root: a compaction mid-append could retire a cell directory
    * the append's committer is writing into. Production would take a
    * per-cell lease; the fixture form takes a JVM lock. */
  private object ivfIncCompactGuard

  /** s14's maintenance pass: merge each FRAGMENTED cell partition
    * (>1 part file — the residue of the staging write's task
    * parallelism plus every s13-style batch append) down to one file,
    * copy-on-write, leaving single-file cells untouched on disk.
    *
    * Scale shape: the rewrite reads only the fragmented cells (cell-
    * partition-pruned scan), repartitions BY CELL so each cell is one
    * task writing one file, and swaps each cell directory atomically —
    * the retired directory is first moved to a `_retired_`-prefixed
    * name, which Spark's partition discovery ignores, so a concurrent
    * probe never sees a half-swapped cell or a double-counted row. Cost
    * is proportional to the fragmented slice, not the index: a daily
    * compaction after a daily append rewrites yesterday's touched cells
    * only. Idempotence is structural (no marker): a second run observes
    * 1 file/cell and returns without reading anything.
    *
    * The reference has no maintenance plane (its store is per-request);
    * this is the lakehouse operation a STANDING index at 100 TB cannot
    * run without — the small-files probe-latency cliff is the failure
    * mode, and the s13 oracle re-pinning the post-compaction probe
    * row-for-row is the "maintenance never changes answers" gate. */
  private[graft] def ivfCompact(s: SparkSession, indexRoot: String): String =
    ivfIncCompactGuard.synchronized {
    val postRoot = new java.io.File(indexRoot, "postings")
    // Crash recovery for the two-step swap below (ADVICE r13): a crash
    // between `cell → _retired_` and `fresh → cell` leaves the cell
    // hidden under _retired_ with no live dir — restore it before
    // computing the fragmented set so no later probe serves an index
    // missing a cell. A _retired_ dir WITH a live twin is the other
    // crash window (swap done, delete pending): finish the delete.
    Option(postRoot.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(d => d.isDirectory && d.getName.startsWith("_retired_cell="))
      .foreach { r =>
        val live = new java.io.File(postRoot,
          r.getName.stripPrefix("_retired_"))
        if (!live.exists())
          java.nio.file.Files.move(r.toPath, live.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        else deleteRecursively(r)
      }
    def partFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.startsWith("part-")).toSeq
    val fragmented = Option(postRoot.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(d => d.isDirectory && d.getName.startsWith("cell=") &&
        partFiles(d).size > 1).toSeq
    if (fragmented.nonEmpty) {
      val cells = fragmented.map(_.getName.stripPrefix("cell=").toInt)
      val tmp = new java.io.File(indexRoot, "postings.compact.tmp")
      deleteRecursively(tmp)
      // one shuffle, fragmented-slice-sized; repartition BY CELL puts each
      // cell in exactly one task, so partitionBy emits one file per cell
      s.read.parquet(postRoot.getAbsolutePath)
        .filter(col("cell").isin(cells: _*))
        .repartition(cells.size, col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(tmp.getAbsolutePath)
      fragmented.foreach { d =>
        val fresh = new java.io.File(tmp, d.getName)
        require(fresh.isDirectory, s"compaction produced no output for ${d.getName}")
        val retired = new java.io.File(postRoot, "_retired_" + d.getName)
        java.nio.file.Files.move(d.toPath, retired.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        java.nio.file.Files.move(fresh.toPath, d.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(retired)
      }
      deleteRecursively(tmp)
    }
    indexRoot
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    java.nio.file.Files.deleteIfExists(f.toPath)
    ()
  }

  /** s12's probe path: serve s2's exact top-k shape from the standing
    * index — the query batch broadcasts onto the staged centroid table
    * (Q·cells probe work), the probed cell list routes the read, and
    * the postings scan is STATICALLY partition-pruned to exactly those
    * cells (scan-metric pinned in IvfIndexSpec: numPartitions = probed
    * cells, never the corpus). Per run the corpus is neither
    * re-clustered nor fully scanned — cost follows the query batch.
    * IvfIndexSpec also pins this frame row-identical to the inline
    * [[ivfTopK]].
    *
    * The cell routing is a driver-side list BY DESIGN (the bounded-
    * collect class: ≤ Q·nProbe ints, the same order as any broadcast
    * build side) — this is how IVF serving works everywhere: the
    * router owns the probed-cell set and dispatches reads for those
    * postings alone. A dynamic-pruning formulation was tried and
    * rejected: Spark's PartitionPruning rule does not recognize a
    * window-derived build side (the per-query rank ≤ nProbe cut), so
    * the DPP filter plans as `dynamicpruningexpression(true)` and the
    * scan silently reads every cell — the static IN list prunes
    * deterministically at plan time instead. */
  private[graft] def ivfTopKFromIndex(s: SparkSession, dir: String,
      indexRoot: String, nQueries: Int, nProbe: Int, k: Int): DataFrame = {
    import s.implicits._
    val queries = Tables(s, dir, "embeddings").filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    ivfProbeIndex(queries, indexRoot, nProbe, k)
  }

  /** The serving core shared by s12/s13's batch probes and st16's
    * streaming micro-batch serve: probe the STANDING index at
    * `indexRoot` with an arbitrary `(query_id, qv)` frame. Per call the
    * work is query-batch-sized (broadcast batch × tiny centroid table,
    * postings scan statically pruned to the probed cells) — which is
    * exactly what makes it safe to invoke once per micro-batch from a
    * stream: serving cost follows the ARRIVAL RATE, never the corpus. */
  private[graft] def ivfProbeIndex(queries: DataFrame, indexRoot: String,
      nProbe: Int, k: Int): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val centroids = s.read.parquet(
      new java.io.File(indexRoot, "centroids").getAbsolutePath)
    // materialized once (tiny: Q·nProbe rows) so the router list and
    // the rerank join share it without recomputing the probe stage
    val probed = probeCells(queries, centroids, nProbe).localCheckpoint(true)
    val probedCells = probed.select($"cell").distinct()
      .as[Int].collect().toSeq.sorted
    // the partition column comes back via directory-name inference as
    // INT — the same type as the source label, so neither the IN list
    // nor the join key coerces mid-plan (the d25 band alignment lesson)
    val postings = s.read.parquet(
      new java.io.File(indexRoot, "postings").getAbsolutePath)
      .filter(col("cell").isin(probedCells: _*))
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    postings.join(broadcast(probed), Seq("cell"))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** s13/s14's shared DuckDB twin — full replay of corpus-centroid
    * derivation, stale-quantizer batch assignment, appended postings
    * and the probe. s14 serves the COMPACTED layout, which must be
    * content-identical — one oracle pins both. A def, not a val (the
    * specs Seq initializes first in declaration order). */
  private def IvfIncOracle: String = """
        WITH corpus AS (
          SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 <> 0),
        batch AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
        e AS (
          SELECT label, UNNEST(embedding) AS v,
                 UNNEST(range(len(embedding))) AS dim
          FROM corpus),
        cent AS (
          SELECT label AS cell, dim,
                 CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
          FROM e GROUP BY label, dim),
        centl AS (
          SELECT cell, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cell),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT b.vec_id, centl.cell,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                     list_sum(list_transform(generate_series(1, len(b.embedding)),
                       i -> (CAST(b.embedding[i] AS DOUBLE) - centroid[i]) *
                            (CAST(b.embedding[i] AS DOUBLE) - centroid[i]))) ASC,
                     cell) AS rn
            FROM batch b CROSS JOIN centl) WHERE rn = 1),
        posts AS (
          SELECT vec_id AS cand_id, embedding AS cv, label AS cell FROM corpus
          UNION ALL
          SELECT b.vec_id AS cand_id, b.embedding AS cv, a.cell
          FROM batch b JOIN assign a USING (vec_id)),
        q AS (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 10),
        probe AS (
          SELECT query_id, qv, cell,
                 list_sum(list_transform(generate_series(1, len(qv)),
                   i -> (CAST(qv[i] AS DOUBLE) - centroid[i]) *
                        (CAST(qv[i] AS DOUBLE) - centroid[i]))) AS cdist
          FROM q CROSS JOIN centl),
        pr AS (
          SELECT query_id, qv, cell,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cdist ASC, cell) AS probe_rank
          FROM probe),
        probed AS (SELECT query_id, qv, cell FROM pr WHERE probe_rank <= 2),
        p AS (
          SELECT query_id, cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                          i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))), 6) AS cosine
          FROM probed JOIN posts USING (cell)
          WHERE query_id != cand_id),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 5
        ORDER BY query_id, rank"""

  /** s2/s12's shared DuckDB twin — the full inline derivation
    * (centroids, probe, rerank); it has no standing index, which is
    * exactly the point: the staged artifact must reproduce the inline
    * math bit-for-bit or the s12 row goes red. A def, not a val: the
    * specs Seq initializes first in declaration order. */
  private def IvfTopKOracle: String = """
        WITH e AS (
          SELECT label, vec_id, embedding,
                 UNNEST(embedding) AS v,
                 UNNEST(range(len(embedding))) AS dim
          FROM embeddings),
        cent AS (
          SELECT label AS cell, dim,
                 CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
          FROM e GROUP BY label, dim),
        centl AS (
          SELECT cell, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cell),
        q AS (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 10),
        probe AS (
          SELECT query_id, qv, cell,
                 list_sum(list_transform(generate_series(1, len(qv)),
                   i -> (CAST(qv[i] AS DOUBLE) - centroid[i]) *
                        (CAST(qv[i] AS DOUBLE) - centroid[i]))) AS cdist
          FROM q CROSS JOIN centl),
        pr AS (
          SELECT query_id, qv, cell,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cdist ASC, cell) AS probe_rank
          FROM probe),
        probed AS (SELECT query_id, qv, cell FROM pr WHERE probe_rank <= 2),
        cand AS (SELECT vec_id AS cand_id, embedding AS cv, label AS cell
                 FROM embeddings),
        p AS (
          SELECT query_id, cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(cv)),
                          i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))), 6) AS cosine
          FROM probed JOIN cand USING (cell)
          WHERE query_id != cand_id),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 5
        ORDER BY query_id, rank"""

  /** s5's per-(vector, anchor, subspace) squared distances — public so
    * the spec can pin encode properties (anchors code to themselves).
    * Sequential left fold in index order, bit-identical to the oracle's
    * list_reduce. */
  def pqSubDistances(s: SparkSession, dir: String, nAnchors: Int,
                     nSub: Int, subDim: Int): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val anchors = emb.filter($"vec_id" < nAnchors)
      .select($"vec_id".as("m"), $"embedding".as("av"))
    emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(anchors))
      .select($"vec_id", $"m", posexplode(expr(
        s"""transform(sequence(0, ${nSub - 1}), j ->
           |  aggregate(zip_with(slice(embedding, j * $subDim + 1, $subDim),
           |                     slice(av, j * $subDim + 1, $subDim),
           |      (x, y) -> (cast(x as double) - cast(y as double))
           |              * (cast(x as double) - cast(y as double))),
           |    cast(0 as double), (acc, v) -> acc + v))""".stripMargin))
        .as(Seq("j", "d")))
  }

  /** Sign-LSH ANN (s4): anchor-hyperplane sign signatures → bucket-keyed
    * candidate join → exact cosine rerank. The anchor dot products fold
    * SEQUENTIALLY in index order (aggregate over zip_with is a left
    * fold), matching the oracle's list_reduce — bit-identical doubles, so
    * bucket assignment never diverges between engines (see the s4
    * QuerySpec scaladoc). */
  def lshTopK(s: SparkSession, dir: String, nPlanes: Int, nQueries: Int,
              k: Int): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val anchors = emb.filter($"vec_id" < nPlanes)
      .select($"vec_id".as("plane"), $"embedding".as("av"))
    val buckets = emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(anchors))
      .withColumn("dot",
        graft.functions.GraftFunctions.dot($"embedding", $"av"))
      .groupBy($"vec_id")
      .agg(sum(when($"dot" >= 0,
          pow(lit(2.0), $"plane".cast("double")).cast("long"))
        .otherwise(0L)).as("bucket"))
    val q = buckets.filter($"vec_id" < nQueries)
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .select($"vec_id".as("query_id"), $"bucket", $"embedding".as("qv"))
    val c = buckets
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .select($"vec_id".as("cand_id"), $"bucket", $"embedding".as("cv"))
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    q.join(c, Seq("bucket"))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** s7: truncated-dimension (Matryoshka-style) two-stage retrieval —
    * the dimension-pruning ANN family beside cell-pruning (s2), plane-
    * bucketing (s4) and code-compression (s5/s6). The coarse pass ranks
    * by dot product over only the first [[nDims]] of 64 dimensions and
    * carries ONLY (cand_id, prefix) — at lake scale that is the stage's
    * whole point: the one all-pairs scan touches 1/8 of the vector
    * bytes, and full vectors are fetched (equi-join by id) for the
    * [[cut]]-sized finalist set alone, never the corpus. Exact cosine
    * re-ranks the finalists. Coarse scores round to 6 dp before the cut
    * (the s2 probe convention) so both engines slice the identical
    * frontier; recall vs exact s1 is pinned in SimilarityRecallSpec. */
  def matryoshkaTopK(s: SparkSession, dir: String, nDims: Int = 8,
                     nQueries: Int = 10, cut: Int = 50, k: Int = 5): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val qFull = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"),
        slice($"embedding", 1, nDims).as("qp"))
    val cPrefix = emb
      .select($"vec_id".as("cand_id"), slice($"embedding", 1, nDims).as("cp"))
    val wCut = Window.partitionBy($"query_id").orderBy($"cdot".desc, $"cand_id")
    val finalists = cPrefix
      .crossJoin(broadcast(qFull.select($"query_id", $"qp")))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cdot",
        round(graft.functions.GraftFunctions.dot($"qp", $"cp"), 6))
      .withColumn("crank", row_number().over(wCut))
      .filter($"crank" <= cut)
      .select($"query_id", $"cand_id")
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    finalists
      .join(emb.select($"vec_id".as("cand_id"), $"embedding".as("cv")), "cand_id")
      .join(broadcast(qFull.select($"query_id", $"qv")), "query_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }


  /** s15/s16's shared DuckDB oracle: sign-pack both 32-dim halves into
    * BIGINTs, XOR+bit_count Hamming cut, exact cosine rerank over the
    * finalists — the identical pipeline stated in SQL. */
  private[graft] def BinaryQuantOracle: String = """
        WITH codes AS (
          SELECT vec_id,
                 CAST(list_sum(list_transform(generate_series(0, 31),
                   i -> CASE WHEN embedding[i + 1] >= 0
                        THEN (CAST(1 AS BIGINT) << i)
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS c0,
                 CAST(list_sum(list_transform(generate_series(0, 31),
                   i -> CASE WHEN embedding[i + 33] >= 0
                        THEN (CAST(1 AS BIGINT) << i)
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS c1
          FROM embeddings),
        q AS (SELECT vec_id AS query_id, c0 AS q0, c1 AS q1
              FROM codes WHERE vec_id < 10),
        h AS (SELECT query_id, c.vec_id AS cand_id,
                     bit_count(xor(c.c0, q0)) + bit_count(xor(c.c1, q1))
                       AS hamming
              FROM codes c CROSS JOIN q WHERE c.vec_id <> query_id),
        f AS (SELECT query_id, cand_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY hamming, cand_id) AS crank
              FROM h),
        p AS (
          SELECT f.query_id, f.cand_id,
                 ROUND(
                   list_sum(list_transform(generate_series(1, len(qe.embedding)),
                     i -> CAST(qe.embedding[i] AS DOUBLE)
                        * CAST(ce.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(qe.embedding)),
                        i -> CAST(qe.embedding[i] AS DOUBLE)
                           * CAST(qe.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, len(ce.embedding)),
                          i -> CAST(ce.embedding[i] AS DOUBLE)
                             * CAST(ce.embedding[i] AS DOUBLE))))), 6) AS cosine
          FROM f
          JOIN embeddings qe ON qe.vec_id = f.query_id
          JOIN embeddings ce ON ce.vec_id = f.cand_id
          WHERE f.crank <= 50),
        r AS (SELECT query_id, cand_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, cand_id) AS rank
              FROM p)
        SELECT query_id, rank, cand_id, cosine FROM r WHERE rank <= 5
        ORDER BY query_id, rank"""

  /** s15: sign-bit binary quantization + Hamming coarse search + exact
    * rerank (see the QuerySpec scaladoc). The code table is two packed
    * 32-bit halves per vector; the coarse candidate pass is XOR +
    * POPCOUNT in whole-stage codegen, the exact pass fetches full
    * vectors for the `cut`-sized finalist set only. */
  /** Pack embedding dims [off, off+32) into one BIGINT: bit i =
    * [v(off+i) >= 0] — the sign-quantization kernel shared by the
    * inline s15 pass and the s16 code-table staging (same expression
    * tree, so artifact codes are bit-identical to inline codes). */
  private def bqHalf(off: Int): org.apache.spark.sql.Column = expr(
    s"""aggregate(transform(sequence(0, 31), i ->
       |  IF(element_at(embedding, i + $off + 1) >= cast(0 as float),
       |     shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
       |  cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin)

  def binaryQuantTopK(s: SparkSession, dir: String, nQueries: Int = 10,
                      cut: Int = 50, k: Int = 5): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val codes = emb.select($"vec_id", bqHalf(0).as("c0"), bqHalf(32).as("c1"))
    val q = codes.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"c0".as("q0"), $"c1".as("q1"))
    val wCut = Window.partitionBy($"query_id")
      .orderBy($"hamming".asc, $"cand_id")
    val finalists = codes
      .select($"vec_id".as("cand_id"), $"c0", $"c1")
      .crossJoin(broadcast(q))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("hamming",
        expr("bit_count(c0 ^ q0) + bit_count(c1 ^ q1)"))
      .withColumn("crank", row_number().over(wCut))
      .filter($"crank" <= cut)
      .select($"query_id", $"cand_id")
    val qFull = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    finalists
      .join(emb.select($"vec_id".as("cand_id"), $"embedding".as("cv")), "cand_id")
      .join(broadcast(qFull), "query_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** s16's STANDING code table: the corpus split's (vec_id, c0, c1)
    * sign codes staged write-once, the batch split packed through the
    * SAME expression and APPENDED (the s13 ingest convention — standing
    * part files byte-untouched, marker-idempotent re-runs; BqCodesSpec
    * pins both at the file level). Packing happens at INGEST, once per
    * vector — the probe never touches a float for the coarse pass.
    * Returns the artifact root. */
  private[graft] def bqCodesRoot(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new java.io.File(sys.props.getOrElse("graft.fixture.dir",
      sys.props("user.dir") + "/data"))
    val base = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = new java.io.File(root, "bqcodes_" + base)
    val fp = Multimodal.sourceFingerprint(
      new java.io.File(dir, "embeddings.parquet"))
    val codesDir = new java.io.File(path, "codes")
    // standing half: corpus split (vec_id % 5 != 0, d25's convention)
    val stamp = s"v2:bq-corpus:$fp"
    val marker = new java.io.File(path.getAbsolutePath + ".staged")
    val upToDate = path.isDirectory && marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp
    if (!upToDate) {
      val aMarker = new java.io.File(path.getAbsolutePath + ".appended")
      java.nio.file.Files.deleteIfExists(aMarker.toPath)
      graft.operators.Mixing.deleteRecursively(path.toPath)
      Tables(s, dir, "embeddings").filter($"vec_id" % 5 =!= 0)
        .select($"vec_id", bqHalf(0).as("c0"), bqHalf(32).as("c1"))
        .write.mode("overwrite").parquet(codesDir.getAbsolutePath)
      java.nio.file.Files.write(marker.toPath, stamp.getBytes)
      ()
    }
    // ingest half: the batch split appends its codes (never rewrites).
    // CRASH-SAFE staging (ADVICE r15 #3): the split writes to a temp
    // dir OUTSIDE codes/, its part files move in under an `append-`
    // prefix, and the marker commits LAST — a crash at any point leaves
    // either no append- files or a partial set the next run deletes
    // (append- names never collide with the corpus half's part- names),
    // so a re-run can never stack duplicate vec_ids into the code table.
    val aStamp = s"v2:bq-append:$fp"
    val aMarker = new java.io.File(path.getAbsolutePath + ".appended")
    val appended = aMarker.isFile &&
      new String(java.nio.file.Files.readAllBytes(aMarker.toPath)) == aStamp
    if (!appended) {
      codesDir.listFiles().filter(_.getName.startsWith("append-"))
        .foreach(f => java.nio.file.Files.delete(f.toPath))
      val tmp = new java.io.File(path, "codes_append_tmp")
      Tables(s, dir, "embeddings").filter($"vec_id" % 5 === 0)
        .select($"vec_id", bqHalf(0).as("c0"), bqHalf(32).as("c1"))
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      tmp.listFiles().filter(_.getName.endsWith(".parquet")).sorted
        .foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(codesDir, "append-" + f.getName).toPath)
        }
      graft.operators.Mixing.deleteRecursively(tmp.toPath)
      java.nio.file.Files.write(aMarker.toPath, aStamp.getBytes)
      ()
    }
    path.getAbsolutePath
  }

  /** s16's COARSE pass, served from the standing code table alone:
    * query codes and candidate codes both come out of the artifact —
    * XOR + POPCOUNT Hamming, cut by (hamming asc, cand_id). Exposed
    * separately so BqCodesSpec can pin that this plan scans NO
    * embedding file (the artifact's whole point: 8 bytes per vector
    * where the float path reads 512). */
  private[graft] def bqCoarseFinalists(s: SparkSession, codesRoot: String,
                                       nQueries: Int, cut: Int): DataFrame = {
    import s.implicits._
    val codes = s.read.parquet(
      new java.io.File(codesRoot, "codes").getAbsolutePath)
    val q = codes.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"c0".as("q0"), $"c1".as("q1"))
    val wCut = Window.partitionBy($"query_id")
      .orderBy($"hamming".asc, $"cand_id")
    codes
      .select($"vec_id".as("cand_id"), $"c0", $"c1")
      .crossJoin(broadcast(q))
      .filter($"query_id" =!= $"cand_id")
      .withColumn("hamming",
        expr("bit_count(c0 ^ q0) + bit_count(c1 ^ q1)"))
      .withColumn("crank", row_number().over(wCut))
      .filter($"crank" <= cut)
      .select($"query_id", $"cand_id")
  }

  /** s16: [[binaryQuantTopK]] served from the standing code table —
    * coarse candidates from [[bqCoarseFinalists]] (codes only), exact
    * cosine fetches full vectors for the finalist set alone. */
  def binaryQuantTopKFromCodes(s: SparkSession, dir: String,
                               codesRoot: String, nQueries: Int = 10,
                               cut: Int = 50, k: Int = 5): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val qFull = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val wTop = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"cand_id")
    bqCoarseFinalists(s, codesRoot, nQueries, cut)
      .join(emb.select($"vec_id".as("cand_id"), $"embedding".as("cv")), "cand_id")
      .join(broadcast(qFull), "query_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }
}
