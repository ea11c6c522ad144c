package graft.dedup

import graft.functions.{ShingleFunctions => SF, TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** PERSISTED MinHash-LSH near-duplicate index — the text-dedup analog of
  * [[graft.vector.VectorIndex]], and the NEAR-dup face of incremental
  * ingest (q_dedup_incremental's bloom handles exact dups): build once
  * over the resident corpus (16-hash minhash signature per document, 4×4
  * banding — the q_dedup_minhash_pairs geometry, so the two faces cannot
  * disagree), persist the band buckets partitioned by a BOUNDED cell key,
  * then probe each new batch against the index without ever touching the
  * resident corpus' text again:
  *
  *  - a probe's scan opens ONLY the cells its own band keys hash into —
  *    `cell IN (…)` is partition pruning over ≤ 4·|batch| (≤ [[DupIndex.Cells]])
  *    directories, so probe IO scales with the batch, not the corpus
  *    (DupIndexSpec proves it by asserting every scanned file lies in a
  *    probed cell);
  *  - the signature STORED in the lists supplies the k/16 Jaccard
  *    estimate (Broder's unbiased estimator — matching minhash
  *    components / 16), so candidate scoring needs no re-shingling of
  *    the indexed side.
  *
  * Layout: `dir/lists/run=<runId>/cell=<c>/…parquet` with data columns
  * (bkey: string — band-prefixed bucket key, doc_id, sig: array&lt;long&gt;).
  * Appends are new `run=` file-sets (base files untouched; duplicate
  * runIds refused by errorifexists) — same durability posture as
  * [[graft.vector.VectorIndex]]: the hardened manifest/commit protocol
  * lives in [[graft.table.SnapshotTable]]; an index over a mutating
  * corpus is rebuilt from a tagged snapshot.
  */
final class DupIndex private (val dir: String) {
  import DupIndex._

  private def lists(s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/lists")

  /** Total (doc, band) entries — metadata-cheap. */
  def count(s: SparkSession): Long = lists(s).count()

  /** Probe a batch of new documents against the index.
    * @param docs (doc_id: long, text: string)
    * @param minEst keep pairs with estimated Jaccard ≥ minEst
    * @return (probe_id, index_id, est_jaccard) — distinct candidate pairs
    *         from the banded equi-join within the probed cells only. */
  def probe(s: SparkSession, docs: DataFrame, minEst: Double): DataFrame = {
    val pb = bands(docs)
    // bounded driver-side probed-cell set (≤ 4·|batch| and ≤ Cells·4):
    // becomes an isin PARTITION filter, so only probed cells' files open
    val cells = pb.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val lst = lists(s).filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    pb.select(col("cell"), col("bkey"),
        col("doc_id").as("probe_id"), col("sig").as("psig"))
      .join(lst.select(col("cell"), col("bkey"),
        col("doc_id").as("index_id"), col("sig").as("isig")),
        Seq("cell", "bkey"))
      .filter(col("probe_id") =!= col("index_id"))
      .dropDuplicates("probe_id", "index_id")
      .withColumn("est_jaccard", expr(
        "cast(aggregate(zip_with(psig, isig, (a, b) -> IF(a = b, 1, 0)), 0, (acc, x) -> acc + x) AS DOUBLE) / cast(16 AS DOUBLE)"))
      .filter(col("est_jaccard") >= minEst)
      .select(col("probe_id"), col("index_id"), col("est_jaccard"))
  }

  /** EXISTENCE probe for the ingest gate: which batch docs near-duplicate
    * ANY resident doc. Differs from [[probe]] in one skew-critical way:
    * the index side is deduped to one witness per DISTINCT signature per
    * bucket before the join. A bucket holding k byte-identical resident
    * docs (the boilerplate hot key — built from a raw corpus, build()
    * doesn't dedup) would otherwise fan each matching probe row into k
    * candidate rows; the gate only needs ONE witness, and distinct
    * signatures are preserved so no τ-match is ever lost. [[probe]] keeps
    * full per-pair output (its contract is the candidate PAIRS). */
  private def probeExists(s: SparkSession, pb: DataFrame, minEst: Double): DataFrame = {
    val cells = pb.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val lst = lists(s).filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("cell"), col("bkey"), col("doc_id").as("index_id"),
        col("sig").as("isig"))
      // exclude the batch's OWN ids BEFORE electing witnesses: a re-ingested
      // resident doc must not have its own row picked as a bucket's sole
      // witness (the self-pair filter below would then discard the only
      // candidate and a true dup would slip through)
      .join(pb.select(col("doc_id").as("index_id")).distinct(),
        Seq("index_id"), "left_anti")
      .dropDuplicates("cell", "bkey", "isig")
    pb.select(col("cell"), col("bkey"),
        col("doc_id").as("probe_id"), col("sig").as("psig"))
      .join(lst, Seq("cell", "bkey")) // self-pairs impossible: own ids excluded above
      .filter(expr(
        "cast(aggregate(zip_with(psig, isig, (a, b) -> IF(a = b, 1, 0)), 0, (acc, x) -> acc + x) AS DOUBLE) / cast(16 AS DOUBLE)") >= minEst)
      .select(col("probe_id").as("doc_id")).distinct()
  }

  /** Incremental add: signature + band the batch and write a new `run=`
    * file-set alongside the base lists (base files byte-untouched —
    * spec-asserted; duplicate runIds refused). */
  def append(s: SparkSession, docs: DataFrame, runId: String): Unit = {
    require(runId.matches("[A-Za-z0-9._-]+"), s"unsafe runId: $runId")
    writeLists(s, this, docs, runId)
  }

  /** Streaming/batch ingest GATE — the `foreachBatch` body for a
    * continuously deduped corpus: drop batch documents near-duplicating
    * the index (probe, est ≥ minEst), dedup the batch against ITSELF
    * (in-batch banded self-join, lowest doc_id survives — the
    * q_semantic_dedup keep rule), append the survivors as
    * `run=batch-<id>`, and return them (the downstream write set).
    *
    * REPLAY-SAFE: the idempotence marker is the writer's `_SUCCESS` file,
    * NOT bare run-directory existence — Spark creates the directory
    * before the write is durable, so a committer that crashed mid-append
    * must re-append on redelivery (the partial directory is cleaned
    * first). A redelivered COMPLETE batchId skips the append — the same
    * batchId-as-runId idempotence contract as the snapshot streaming
    * sink, so at-least-once delivery yields exactly-once index state. */
  def ingestBatch(s: SparkSession, docs: DataFrame, batchId: Long,
      minEst: Double): DataFrame = {
    // ONE banding pass per batch: tokenize + shingle + 16-hash minhash is
    // the expensive per-row work — computed once and shared by the index
    // probe, the in-batch self-join, and the survivor append (unpersisted
    // after the write; a caller re-consuming the returned survivors pays
    // at most one recompute)
    // CLEAN FIRST, scan second: a crashed append can leave VISIBLE
    // part-files (task commits land before _SUCCESS). probeExists/lists
    // snapshot the file listing when the read is constructed, so deleting
    // residue after building the probe would make its scan read a stale
    // listing and fail on the vanished files.
    val runDir = Paths.get(dir, "lists", s"run=batch-$batchId")
    val complete = Files.exists(runDir.resolve("_SUCCESS"))
    if (!complete && Files.exists(runDir)) DupIndex.deleteRecursively(runDir)
    val pb = bands(docs).persist()
    try {
      val vsIndex = probeExists(s, pb, minEst)
      val inBatch = pb.select(col("cell"), col("bkey"),
          col("doc_id").as("id_a"), col("sig").as("psig"))
        .join(pb.select(col("cell"), col("bkey"),
          col("doc_id").as("id_b"), col("sig").as("isig")), Seq("cell", "bkey"))
        .filter(col("id_a") > col("id_b")) // a has a LOWER-id neighbor b
        .dropDuplicates("id_a", "id_b")
        .withColumn("est", expr(
          "cast(aggregate(zip_with(psig, isig, (a, b) -> IF(a = b, 1, 0)), 0, (acc, x) -> acc + x) AS DOUBLE) / cast(16 AS DOUBLE)"))
        .filter(col("est") >= minEst)
        .select(col("id_a").as("doc_id")).distinct()
      val dupIds = vsIndex.union(inBatch).distinct()
      val survivors = docs.join(dupIds, Seq("doc_id"), "left_anti")
      if (!complete)
        DupIndex.writeBandRows(this,
          pb.join(dupIds, Seq("doc_id"), "left_anti"), s"batch-$batchId")
      survivors
    } finally pb.unpersist()
  }
}

object DupIndex {

  /** Cell space per band for the partition key: 4 bands × Cells dirs.
    * Bounded so the directory count is fixed at any corpus size (a raw
    * bucket-valued partition key would create one directory per distinct
    * band key — unbounded small-file explosion). */
  val Cells = 64

  /** (doc_id, cell, bkey, sig) — one row per (doc, band). The band key is
    * band-prefixed (same 4×4 slicing as q_dedup_minhash_pairs) and the
    * cell is a stable hash of the key folded into the bounded space. */
  private[graft] def bands(docs: DataFrame): DataFrame = {
    SF.register(docs.sparkSession)
    val sig = docs
      .withColumn("w", TF.tokens(col("text")))
      .withColumn("sig", SF.minhashSig(col("w")))
      .select(col("doc_id"), col("sig"))
    val bandStructs = array((0 until 4).map { j =>
      struct(
        concat_ws("_", lit(j) +:
          (0 until 4).map(r => col("sig").getItem(4 * j + r)): _*).as("bkey"))
    }: _*)
    sig.select(col("doc_id"), col("sig"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.bkey").as("bkey"))
      .withColumn("cell", pmod(xxhash64(col("bkey")), lit(4 * Cells)).cast("int"))
  }

  /** Build over the resident corpus: `docs` = (doc_id, text). */
  def build(s: SparkSession, docs: DataFrame, dir: String): DupIndex = {
    Files.createDirectories(Paths.get(dir))
    val idx = new DupIndex(dir)
    writeLists(s, idx, docs, runId = "base")
    idx
  }

  def open(dir: String): DupIndex = {
    require(Files.exists(Paths.get(dir, "lists")), s"no index in $dir")
    new DupIndex(dir)
  }

  private def writeLists(s: SparkSession, idx: DupIndex,
      docs: DataFrame, runId: String): Unit =
    writeBandRows(idx, bands(docs), runId)

  /** Write pre-banded rows as one `run=` file-set (shared by the fresh
    * path above and the ingest gate, which reuses its persisted bands). */
  private[dedup] def writeBandRows(idx: DupIndex,
      rows: DataFrame, runId: String): Unit =
    rows.select(col("cell"), col("bkey"), col("doc_id"), col("sig"))
      .write.mode("errorifexists").partitionBy("cell")
      .parquet(s"${idx.dir}/lists/run=$runId")

  private[dedup] def deleteRecursively(p: java.nio.file.Path): Unit = {
    val w = Files.walk(p)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => Files.delete(q))
    finally w.close()
  }
}
