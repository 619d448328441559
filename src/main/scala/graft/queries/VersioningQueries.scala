package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryDef, Tables}
import graft.operators.Versioning

/** Corpus-versioning harness queries (operators.Versioning): snapshot
  * diff, MERGE/upsert, SCD-2 history. Two corpus snapshots are derived
  * deterministically from the documents table — old = doc_id % 7 != 0,
  * new = doc_id % 5 != 0 with the text fingerprint rewritten ("v2") when
  * doc_id % 11 == 0 — so both engines replay identical added / removed /
  * changed populations, and the md5 fingerprints compare bit-for-bit.
  * Outputs are per-class aggregates carrying a fingerprint checksum
  * (portable md5 -> BIGINT, mod 1e9+7): a diff/merge bug that keeps the
  * right KEYS but the wrong VERSION of a row still fails the hash.
  */
object VersioningQueries {

  // portable fp checksum: same 15-hex-digit prefix -> BIGINT both engines
  private def fpChk(fp: org.apache.spark.sql.Column) =
    pmod(conv(substring(fp, 1, 15), 16, 10).cast(LongType), lit(1000000007L))
  private def fpChkSql(c: String) =
    s"(CAST('0x' || substring($c, 1, 15) AS BIGINT) % 1000000007)"

  private def oldSnap(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("fp"), col("source"))

  private def newSnap(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, md5(concat(col("text"), lit("v2"))))
          .otherwise(md5(col("text"))).as("fp"),
        col("source"))

  private val snapSql =
    """old AS (
      |  SELECT doc_id, md5(text) AS fp, source
      |  FROM documents WHERE doc_id % 7 <> 0
      |), new AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN md5(text || 'v2')
      |         ELSE md5(text) END AS fp, source
      |  FROM documents WHERE doc_id % 5 <> 0
      |)""".stripMargin

  // ---- snapshot diff: classify keys across the two snapshots; the
  // per-class checksum covers the SURVIVING fingerprint (new for
  // added/changed, old for removed).
  private def versionDiff(s: SparkSession, dir: String): DataFrame =
    Versioning.diffSnapshots(oldSnap(s, dir), newSnap(s, dir), "doc_id", "fp")
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(coalesce(col("new_fp"), col("old_fp")))).as("fp_chk"))
      .orderBy(col("change_type"))

  private val versionDiffSql =
    s"""WITH $snapSql, d AS (
       |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |    CASE WHEN o.doc_id IS NULL THEN 'added'
       |         WHEN n.doc_id IS NULL THEN 'removed'
       |         WHEN o.fp <> n.fp THEN 'changed' END AS change_type,
       |    COALESCE(n.fp, o.fp) AS fp
       |  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
       |)
       |SELECT change_type, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM d WHERE change_type IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- MERGE/upsert: the refresh batch (the added + changed slice of
  // the new snapshot) merged into the old corpus — batch wins on key
  // match, inserts append, the rest passes through untouched. The
  // fp checksum proves each key carries the RIGHT version afterwards.
  private def versionUpsert(s: SparkSession, dir: String): DataFrame = {
    val batch = newSnap(s, dir)
      .filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0)
    Versioning.upsert(oldSnap(s, dir), batch, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private val versionUpsertSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), merged AS (
       |  SELECT * FROM batch
       |  UNION ALL
       |  SELECT * FROM old
       |  WHERE doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- SCD-2 apply: history opened at t1 from the old snapshot, evolved
  // to the new snapshot at t2. Four version classes fall out of the
  // (valid_from, valid_to) grouping: still-open t1 rows (unchanged),
  // t1 rows closed at t2 (changed + removed), t2-opened rows (changed +
  // added). Checksums pin WHICH fingerprint each class carries.
  private val T1 = "2026-01-01 00:00:00"
  private val T2 = "2026-02-01 00:00:00"

  private def versionScd2(s: SparkSession, dir: String): DataFrame = {
    val hist = oldSnap(s, dir).drop("source")
      .withColumn("valid_from", lit(T1).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    Versioning.scd2Apply(hist, newSnap(s, dir).drop("source"),
        "doc_id", "fp", T2)
      .groupBy(date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("valid_to"), "yyyy-MM-dd"), lit("open"))
          .as("valid_to"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("valid_from"), col("valid_to"))
  }

  private val versionScd2Sql =
    s"""WITH $snapSql, j AS (
       |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |    o.doc_id AS o_id, n.doc_id AS n_id, o.fp AS o_fp, n.fp AS n_fp
       |  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
       |), vrows AS (
       |  SELECT doc_id, o_fp AS fp, '2026-01-01' AS valid_from,
       |         '2026-02-01' AS valid_to
       |  FROM j WHERE o_id IS NOT NULL AND (n_id IS NULL OR o_fp <> n_fp)
       |  UNION ALL
       |  SELECT doc_id, o_fp, '2026-01-01', 'open'
       |  FROM j WHERE o_id IS NOT NULL AND n_id IS NOT NULL AND o_fp = n_fp
       |  UNION ALL
       |  SELECT doc_id, n_fp, '2026-02-01', 'open'
       |  FROM j WHERE n_id IS NOT NULL AND (o_id IS NULL OR o_fp <> n_fp)
       |)
       |SELECT valid_from, valid_to, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM vrows GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- merge-on-read corpus store (operators.CorpusStore), end to end:
  // init the base from the old snapshot, append the refresh batch as
  // delta 1, append mod-13 tombstones as delta 2, READ. Last-writer-wins
  // says delta-2 deletes override delta-1 upserts for their keys, the
  // base anti-joins on all delta keys (broadcast, plan-asserted in
  // CorpusStoreSpec), and the oracle reconstructs the same final state
  // relationally — so a resolution bug (wrong winner, leaked tombstone,
  // double-kept base row) fails the hash. The store lives under the JVM
  // tmpdir keyed by the sf dir's md5 (same convention as IvfModelStore)
  // and is rebuilt idempotently per run.
  private def corpusStoreRead(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_store_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir), store)
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    CorpusStore.read(s, store, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private val corpusStoreReadSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- manifest-pruned store read (CorpusStore x ScanPruning), end to
  // end: init the store RANGE-LAID-OUT on doc_id with a stats manifest,
  // append a refresh batch and tombstones (each append extends the
  // manifest with one O(batch) aggregate — never an O(corpus) rescan),
  // then read through the manifest with a box on the low quarter of the
  // id space. prunedRead opens only the base files whose min/max box
  // intersects, but still resolves against ALL delta keys — so a stale
  // base version of an overridden key cannot leak back in through the
  // pruning. The row filter is re-applied on top (answer transparency),
  // and the oracle reconstructs the same final state relationally with
  // the same predicate — a pruning bug that drops or resurrects rows
  // fails the hash, not just a structural file count.
  private def storePrunedRead(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    import graft.sources.ScanPruning
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_pruned_${IvfModelStore.dirKey(dir)}"
    val hi = Tables.documents(s, dir).agg(max(col("doc_id"))).head().getLong(0) / 4
    CorpusStore.init(oldSnap(s, dir).repartitionByRange(8, col("doc_id")),
      store, statsCols = Seq("doc_id"))
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    CorpusStore.prunedRead(s, store, "doc_id",
        ScanPruning.boxPredicate(Seq(("doc_id", 0L, hi))))
      .filter(col("doc_id").between(0L, hi))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private val storePrunedReadSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final
       |WHERE doc_id BETWEEN 0 AND (SELECT MAX(doc_id) // 4 FROM documents)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- cluster-on-compact (CorpusStore.compact(clusterBy) x
  // ScanPruning): the base starts HASH-laid-out (boxes span the id
  // domain, pruning impossible), takes a refresh batch and tombstones,
  // then compacts WITH a range layout — the O(corpus) fold doubles as
  // the re-clustering moment, and the rebuilt manifest prunes the new
  // base like a fresh landing. The read is a post-compact prunedRead
  // over the upper half of the id space; the oracle reconstructs the
  // same final state relationally, so a fold that drops, duplicates, or
  // mis-resolves rows during the re-layout fails the hash (structural
  // file-skipping evidence is CorpusStoreSpec's subject).
  private def storeClusterCompact(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    import graft.sources.ScanPruning
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_cc_${IvfModelStore.dirKey(dir)}"
    val hi = Tables.documents(s, dir).agg(max(col("doc_id"))).head().getLong(0)
    CorpusStore.init(oldSnap(s, dir).repartition(8, col("doc_id")), store,
      statsCols = Seq("doc_id"))
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    CorpusStore.compact(s, store, "doc_id", clusterBy = Seq("doc_id"),
      clusterFiles = 8) // pinned so the half-domain box prunes at every sf
    CorpusStore.prunedRead(s, store, "doc_id",
        ScanPruning.boxPredicate(Seq(("doc_id", hi / 2, hi))))
      .filter(col("doc_id").between(hi / 2, hi))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private val storeClusterCompactSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final
       |WHERE doc_id BETWEEN (SELECT MAX(doc_id) // 2 FROM documents)
       |  AND (SELECT MAX(doc_id) FROM documents)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- minor (delta-level) compaction (CorpusStore.compactDeltas): the
  // LSM level-0 fold. THREE separate appends land the refresh in stages —
  // batch A (mod-7 slice), batch B (mod-11 slice; the mod-77 overlap
  // re-upserts identical rows, exercising cross-delta last-writer-wins),
  // then the mod-13 tombstones — and compactDeltas nets them into ONE
  // delta dir + ONE manifest part WITHOUT touching the base. The final
  // state equals the classic two-append reconstruction (same relational
  // oracle as corpus_store_read), and the fold's structural outcome is
  // pinned INTO the hash: n_live_deltas / n_manifest_parts ride as
  // columns the oracle states as constants — a fold that silently
  // no-ops, leaves extra live dirs, or forgets to collapse the manifest
  // fails the compare, not just a spec.
  private def storeMinorCompact(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_minor_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir).repartitionByRange(8, col("doc_id")),
      store, statsCols = Seq("doc_id"))
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 3L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    require(CorpusStore.compactDeltas(s, store, "doc_id"),
      "three live deltas must fold")
    val nLive = CorpusStore.describe(s, store)
      .filter(col("kind") === "delta").count()
    val mPath = new org.apache.hadoop.fs.Path(s"$store/manifest")
    val nParts = mPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      .listStatus(mPath).count(_.getPath.getName.endsWith(".parquet")).toLong
    CorpusStore.read(s, store, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .withColumn("n_live_deltas", lit(nLive))
      .withColumn("n_manifest_parts", lit(nParts))
      .orderBy(col("source"))
  }

  // ---- two-tier maintenance policy e2e (CorpusStore.maintain): three
  // streaming-cadence appends with maintain() after each — the dir-count
  // knob at 2 keeps the live set folded minor-tier as it grows — then
  // the row-ratio knob trips the MAJOR fold. The tier SEQUENCE the
  // policy chose is hashed into the compare as a literal column: a
  // policy that folds where none belongs, skips a due fold, or majors
  // early produces a different string and fails the hash; the content
  // aggregate over the final read fails if any fold changed an answer
  // (same final state as store_minor_compact — the folds are supposed
  // to be invisible to it).
  private def storeMaintainPolicy(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_mntn_${IvfModelStore.dirKey(dir)}"
    // no stats manifest: the policy decision + fold answers are the
    // subject here; manifest-part folding is store_minor_compact's
    CorpusStore.init(oldSnap(s, dir).repartitionByRange(8, col("doc_id")), store)
    def mnt(): String = CorpusStore.maintain(s, store, "doc_id",
      maxLiveDeltas = 2, maxDeltaToBaseRatio = 1000.0)
    val tiers = scala.collection.mutable.ArrayBuffer.empty[String]
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0))
    tiers += mnt() // one live delta: under both knobs
    CorpusStore.append(s, store, 2L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 11 === 0))
    tiers += mnt() // two live dirs: minor fold
    CorpusStore.append(s, store, 3L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    tiers += mnt() // fold + fresh delta: minor again
    tiers += CorpusStore.maintain(s, store, "doc_id",
      maxLiveDeltas = 16, maxDeltaToBaseRatio = 1.0e-9) // ratio trips: major
    val nLive = CorpusStore.describe(s, store)
      .filter(col("kind") === "delta").count()
    CorpusStore.read(s, store, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .withColumn("tiers", lit(tiers.mkString(",")))
      .withColumn("n_live_deltas", lit(nLive))
      .orderBy(col("source"))
  }

  private val storeMaintainPolicySql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk,
       |  'none,minor,minor,major' AS tiers,
       |  CAST(0 AS BIGINT) AS n_live_deltas
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  private val storeMinorCompactSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk,
       |  CAST(1 AS BIGINT) AS n_live_deltas,
       |  CAST(2 AS BIGINT) AS n_manifest_parts
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- refresh pipeline e2e: the real ingest shape — dedup the batch
  // against history BEFORE merging. The batch streams through
  // Dedup.incrementalDups (broadcast bloom probe + exact fp semi-join —
  // neither side of the check shuffles the corpus), content-duplicate
  // rows are anti-joined away by key, and only the fresh remainder is
  // merged into the store. Composes three families (dedup, versioning,
  // store) as one lazy plan; the oracle reconstructs it relationally
  // (fp NOT IN history, then last-writer-wins), so an over- or
  // under-aggressive dedup step changes the surviving row set and fails
  // the hash. Note: mod-11 "changed" docs carry a rewritten fp, so they
  // survive the content dedup and overwrite — exactly the intended
  // refresh semantics (same content = dropped, new content = merged).
  private def pipelineRefreshStore(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, Dedup, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_refresh_${IvfModelStore.dirKey(dir)}"
    val old = oldSnap(s, dir)
    val batch = newSnap(s, dir)
      .filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0)
    val dups = Dedup.incrementalDups(old.select(col("fp")), batch)
    val fresh = batch.join(dups.select(col("doc_id")), Seq("doc_id"), "left_anti")
    CorpusStore.init(old, store)
    CorpusStore.append(s, store, 1L, "doc_id", fresh)
    CorpusStore.read(s, store, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private val pipelineRefreshStoreSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), fresh AS (
       |  SELECT * FROM batch WHERE fp NOT IN (SELECT fp FROM old)
       |), final AS (
       |  SELECT * FROM fresh
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id NOT IN (SELECT doc_id FROM fresh)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- incremental aggregate maintenance (the materialized-view
  // refresh): a per-source aggregate table (n docs, id mass, fp
  // checksum) is maintained from the store's CDC feed at O(changes)
  // instead of recomputed at O(corpus). The composition:
  //   1. agg0 — the aggregate as of seq 0 (computed once at init);
  //   2. changesSince(0) — the NET per-key ops of the refresh (O(changes),
  //      base never opened);
  //   3. lookupJoin(changed keys, asOfSeq = 0) — the PRE-batch versions
  //      of exactly the changed keys, fetched through the per-file key
  //      blooms (~O(changed keys) file opens, not a corpus scan; when
  //      the changed-key count exceeds maxPruneKeys — this fixture's
  //      refresh touches ~25% of keys at gen1000x — the count guard
  //      falls back to a full as-of read, the right plan when nearly
  //      every file holds a changed key anyway);
  //   4. maintained = agg0 + new-version contributions - old-version
  //      contributions, one tiny |sources|-row fold.
  // The oracle RECOMPUTES the final state relationally and aggregates
  // it — so the maintained table must equal the ground-truth recompute
  // bit-for-bit (an incremental update that double-counts, misses a
  // tombstone, or adjusts the wrong group fails rows+hash). Inserted
  // keys have no old version (lookupJoin returns nothing), deleted keys
  // have no new one, and a group migration subtracts from the old
  // source and adds to the new — all falling out of the +/- algebra.
  private def pipelineIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_incr_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir).repartition(8, col("doc_id")), store,
      statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    val agg0 = oldSnap(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    val changes = CorpusStore.changesSince(s, store, "doc_id", 0L)
    val oldRows = CorpusStore.lookupJoin(s, store, "doc_id",
      changes.select(col("doc_id")), asOfSeq = Some(0L))
    val plus = changes.filter(col("op") === "u").groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
    val minus = oldRows.groupBy(col("source"))
      .agg((-count(lit(1))).as("n"), (-sum(col("doc_id"))).as("id_sum"),
        (-sum(fpChk(col("fp")))).as("fp_chk"))
    agg0.unionByName(plus).unionByName(minus)
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n"), sum(col("id_sum")).as("id_sum"),
        sum(col("fp_chk")).as("fp_chk"))
      .filter(col("n") > 0)
      .orderBy(col("source"))
  }

  // ground truth: aggregate the RECOMPUTED final state — identical to
  // corpus_store_read's reconstruction
  private val pipelineIncrementalAggSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- time travel (CorpusStore.readAt): the SAME store read at two
  // asOf points in one result — as of seq 1 the refresh batch is applied
  // but the seq-2 tombstones are not yet visible; as of seq 2 they are.
  // Tagging each snapshot with as_of and unioning pins the asOf BOUNDARY
  // (a readAt that leaks newer deltas collapses the two snapshots into
  // one and fails rows+hash; one that drops older deltas loses the batch
  // from both). The oracle reconstructs both states relationally.
  private def storeTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_tt_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir), store)
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    def snapAgg(asOf: Long): DataFrame =
      CorpusStore.readAt(s, store, "doc_id", asOf)
        .groupBy(col("source")).agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"), sum(fpChk(col("fp"))).as("fp_chk"))
        .withColumn("as_of", lit(asOf))
    snapAgg(1L).unionByName(snapAgg(2L))
      .select(col("as_of"), col("source"), col("n"), col("id_sum"), col("fp_chk"))
      .orderBy(col("as_of"), col("source"))
  }

  private val storeTimeTravelSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), at1 AS (
       |  SELECT * FROM batch
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id NOT IN (SELECT doc_id FROM batch)
       |), at2 AS (
       |  SELECT * FROM at1 WHERE doc_id % 13 <> 0
       |), both_snaps AS (
       |  SELECT CAST(1 AS BIGINT) AS as_of, * FROM at1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT) AS as_of, * FROM at2
       |)
       |SELECT as_of, source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM both_snaps GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- CDC feed (CorpusStore.changesSince): the net per-key op since a
  // consumer's sync point, read from the NEWER deltas alone — the base
  // is never opened (O(changes), plan shape locked in CorpusStoreSpec).
  // Two sync points in one result: since 0 the feed nets delta 1's
  // upserts against delta 2's tombstones (tombstone wins per key); since
  // 1 only the tombstones remain. Tombstone rows carry a NULL fp, so the
  // fp checksum also pins that 'd' rows carry no stale payload.
  private def storeChangesFeed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_cdc_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir), store)
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    def feedAgg(since: Long): DataFrame =
      CorpusStore.changesSince(s, store, "doc_id", since)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"),
          coalesce(sum(fpChk(col("fp"))), lit(0L)).as("fp_chk"))
        .withColumn("since", lit(since))
    feedAgg(0L).unionByName(feedAgg(1L))
      .select(col("since"), col("op"), col("n"), col("id_sum"), col("fp_chk"))
      .orderBy(col("since"), col("op"))
  }

  private val storeChangesFeedSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), dels AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 13 = 0
       |), feed AS (
       |  SELECT CAST(0 AS BIGINT) AS since, 'd' AS op, doc_id,
       |         CAST(NULL AS VARCHAR) AS fp FROM dels
       |  UNION ALL
       |  SELECT CAST(0 AS BIGINT), 'u', doc_id, fp FROM batch
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dels)
       |  UNION ALL
       |  SELECT CAST(1 AS BIGINT), 'd', doc_id, CAST(NULL AS VARCHAR) FROM dels
       |)
       |SELECT since, op, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(COALESCE(SUM(${fpChkSql("fp")}), 0) AS BIGINT) AS fp_chk
       |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- schema evolution (CorpusStore.read(evolveSchema)): the refresh
  // batch ADDS a lang column; the merge-on-read resolution widens the
  // result (base rows read null in the new column) without any corpus
  // rewrite. The per-bucket fp checksum pins that the widened read still
  // carries the RIGHT row versions, and the 'none' bucket (base
  // passthrough mass) catches a resolution that silently drops or
  // duplicates unwidened rows.
  private def storeSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_evo_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir), store)
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0)
        .withColumn("lang",
          when(col("doc_id") % 2 === 0, lit("en")).otherwise(lit("pt"))))
    CorpusStore.read(s, store, "doc_id", evolveSchema = true)
      .groupBy(coalesce(col("lang"), lit("none")).as("lang"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("lang"))
  }

  private val storeSchemaEvolutionSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT doc_id, fp,
       |    CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'pt' END AS lang
       |  FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT doc_id, fp, lang FROM batch
       |  UNION ALL
       |  SELECT doc_id, fp, CAST(NULL AS VARCHAR) AS lang FROM old
       |  WHERE doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT COALESCE(lang, 'none') AS lang, COUNT(*) AS n,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- bloom point lookup (CorpusStore.lookup x ScanPruning key
  // blooms): the base is HASH-laid-out, so every file's min/max box
  // spans the whole id domain and box pruning cannot skip anything —
  // only the per-file key blooms can. The lookup resolves deltas as
  // usual (an overridden key returns its delta version, a tombstoned
  // one vanishes), so the oracle filters the reconstructed final state
  // to the same literal id set. Structural file-skipping evidence lives
  // in CorpusStoreSpec; this row pins the ANSWER at gate scale.
  private val lookupIds: Seq[Long] = 1L to 40L

  private def storeKeyLookup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_kv_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir).repartition(8, col("doc_id")), store,
      statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
    CorpusStore.lookup(s, store, "doc_id", lookupIds)
      .select(col("doc_id"), col("source"), fpChk(col("fp")).as("fp_chk"))
      .orderBy(col("doc_id"))
  }

  private val storeKeyLookupSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT doc_id, source, ${fpChkSql("fp")} AS fp_chk
       |FROM final WHERE doc_id IN (${lookupIds.mkString(", ")})
       |ORDER BY doc_id""".stripMargin

  // ---- row-level DML (CorpusStore.deleteWhere / updateWhere): UPDATE
  // then DELETE as ordinary merge-on-read deltas — zero corpus rewrite.
  // The update rewrites fp for doc_id % 3 == 0 against the post-batch
  // state (seq 2 sees as-of-1); the delete tombstones doc_id % 13 == 0
  // against the post-update state (seq 3 sees as-of-2). The verbs'
  // RETURN counts are pinned as columns (the oracle recomputes them
  // relationally), and the fp checksum pins that exactly the matched
  // rows — and only they — carry the rewritten fingerprint afterwards.
  private def storeDmlWhere(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CorpusStore, IvfModelStore}
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_dml_${IvfModelStore.dirKey(dir)}"
    CorpusStore.init(oldSnap(s, dir), store)
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    val nUpd = CorpusStore.updateWhere(s, store, "doc_id", 2L,
      col("doc_id") % 3 === 0,
      Map("fp" -> md5(concat(col("fp"), lit("upd")))))
    val nDel = CorpusStore.deleteWhere(s, store, "doc_id", 3L,
      col("doc_id") % 13 === 0)
    CorpusStore.read(s, store, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .withColumn("n_updated", lit(nUpd))
      .withColumn("n_deleted", lit(nDel))
      .orderBy(col("source"))
  }

  private val storeDmlWhereSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), s1 AS (
       |  SELECT * FROM batch
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id NOT IN (SELECT doc_id FROM batch)
       |), s2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN md5(fp || 'upd') ELSE fp END AS fp,
       |    source
       |  FROM s1
       |), final AS (
       |  SELECT * FROM s2 WHERE doc_id % 13 <> 0
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk,
       |  CAST((SELECT COUNT(*) FROM s1 WHERE doc_id % 3 = 0) AS BIGINT) AS n_updated,
       |  CAST((SELECT COUNT(*) FROM s2 WHERE doc_id % 13 = 0) AS BIGINT) AS n_deleted
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- READ-ONLY store variants: the e2e store queries above rebuild
  // their store (init + 2 appends + manifest) INSIDE the measured run, so
  // their bench budgets are setup-dominated and a regression in the READ
  // plan could hide under setup noise. These variants build the SAME
  // store state once per corpus (content-versioned marker, rebuilt when
  // the store layout version bumps — the IvfModelStore staleness
  // pattern) and time only the read. Correctness is still oracle-gated:
  // the read result is identical to the e2e twin's, so the SQL is
  // shared verbatim. The e2e twins remain the setup-inclusive evidence;
  // these are the budgets of record for the read plans.

  /** Bump when the store/manifest ON-DISK layout changes — a prebuilt
    * store from an older layout must be rebuilt, not trusted. */
  private val RoStoreVersion = "v2-multipart-manifest"

  private def ensureRoStore(s: SparkSession, dir: String, tag: String)
      (build: String => Unit): String = {
    import graft.operators.IvfModelStore
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_ro_${tag}_${IvfModelStore.dirKey(dir)}"
    val marker = new java.io.File(store, "_ro_built")
    val fresh = marker.exists && {
      val src = scala.io.Source.fromFile(marker)
      try src.mkString.trim == RoStoreVersion finally src.close()
    }
    if (!fresh) {
      if (marker.exists) marker.delete() // a stale marker must not survive a failed rebuild
      build(store)
      val w = new java.io.PrintWriter(marker)
      try w.println(RoStoreVersion) finally w.close()
    }
    store
  }

  /** The shared e2e delta pattern: refresh batch at seq 1, mod-13
    * tombstones at seq 2 — over a caller-chosen base layout/manifest. */
  private def buildSnapStore(s: SparkSession, dir: String, store: String,
      baseLayout: DataFrame => DataFrame, statsCols: Seq[String],
      bloomCols: Seq[String]): Unit = {
    import graft.operators.CorpusStore
    CorpusStore.init(baseLayout(oldSnap(s, dir)), store,
      statsCols = statsCols, bloomCols = bloomCols)
    CorpusStore.append(s, store, 1L, "doc_id",
      newSnap(s, dir).filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0))
    CorpusStore.append(s, store, 2L, "doc_id",
      oldSnap(s, dir).limit(0),
      deleteKeys = Some(Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0).select(col("doc_id"))))
  }

  private def storeRoPrunedRead(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStore
    import graft.sources.ScanPruning
    val store = ensureRoStore(s, dir, "pruned")(st => buildSnapStore(s, dir, st,
      _.repartitionByRange(8, col("doc_id")), Seq("doc_id"), Nil))
    val hi = Tables.documents(s, dir).agg(max(col("doc_id"))).head().getLong(0) / 4
    CorpusStore.prunedRead(s, store, "doc_id",
        ScanPruning.boxPredicate(Seq(("doc_id", 0L, hi))))
      .filter(col("doc_id").between(0L, hi))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private def storeRoKeyLookup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStore
    val store = ensureRoStore(s, dir, "kv")(st => buildSnapStore(s, dir, st,
      _.repartition(8, col("doc_id")), Seq("doc_id"), Seq("doc_id")))
    CorpusStore.lookup(s, store, "doc_id", lookupIds)
      .select(col("doc_id"), col("source"), fpChk(col("fp")).as("fp_chk"))
      .orderBy(col("doc_id"))
  }

  // ---- lookup JOIN (CorpusStore.lookupJoin): the probe keys come from a
  // FRAME (documents with doc_id % 17 = 3 — ~n/17 keys), are collected
  // under the count guard, prune base files via the per-file blooms, and
  // the store rows semi-join against the broadcast key set. The ~n/17
  // sizing deliberately walks the operator through ALL THREE probe
  // regimes across the gate scales: 30 keys at sf0.01 (the OR-chain
  // form), 294 / 2,942 at sf0.1 / sf~1 (the array-literal
  // bloom_might_contain_any form past OrChainMaxKeys=64), and 294k at
  // gen1000x (past maxPruneKeys=100k — the count-guarded full-read
  // fallback that protects the driver), with the SAME oracle judging
  // every regime. Runs over the SAME prebuilt hash-laid-out store as
  // store_ro_key_lookup (blooms are the only pruning signal). The oracle
  // reconstructs the final state and applies the same key predicate — a
  // probe false negative (missing rows) or a leaked non-probe key fails
  // rows+hash.
  private def storeJoinLookup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStore
    val store = ensureRoStore(s, dir, "kv")(st => buildSnapStore(s, dir, st,
      _.repartition(8, col("doc_id")), Seq("doc_id"), Seq("doc_id")))
    val keys = Tables.documents(s, dir)
      .filter(col("doc_id") % 17 === 3).select(col("doc_id"))
    CorpusStore.lookupJoin(s, store, "doc_id", keys)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(fpChk(col("fp"))).as("fp_chk"))
      .orderBy(col("source"))
  }

  private val storeJoinLookupSql =
    s"""WITH $snapSql, batch AS (
       |  SELECT * FROM new WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
       |), final AS (
       |  SELECT * FROM batch WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT * FROM old WHERE doc_id % 13 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM batch)
       |)
       |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(${fpChkSql("fp")}) AS BIGINT) AS fp_chk
       |FROM final
       |WHERE doc_id IN (SELECT doc_id FROM documents WHERE doc_id % 17 = 3)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private def storeRoTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStore
    val store = ensureRoStore(s, dir, "tt")(st => buildSnapStore(s, dir, st,
      identity, Nil, Nil))
    def snapAgg(asOf: Long): DataFrame =
      CorpusStore.readAt(s, store, "doc_id", asOf)
        .groupBy(col("source")).agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"), sum(fpChk(col("fp"))).as("fp_chk"))
        .withColumn("as_of", lit(asOf))
    snapAgg(1L).unionByName(snapAgg(2L))
      .select(col("as_of"), col("source"), col("n"), col("id_sum"), col("fp_chk"))
      .orderBy(col("as_of"), col("source"))
  }

  private def storeRoChangesFeed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStore
    val store = ensureRoStore(s, dir, "cdc")(st => buildSnapStore(s, dir, st,
      identity, Nil, Nil))
    def feedAgg(since: Long): DataFrame =
      CorpusStore.changesSince(s, store, "doc_id", since)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"),
          coalesce(sum(fpChk(col("fp"))), lit(0L)).as("fp_chk"))
        .withColumn("since", lit(since))
    feedAgg(0L).unionByName(feedAgg(1L))
      .select(col("since"), col("op"), col("n"), col("id_sum"), col("fp_chk"))
      .orderBy(col("since"), col("op"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("version_diff", Some(versionDiffSql), versionDiff),
    QueryDef("version_upsert", Some(versionUpsertSql), versionUpsert),
    QueryDef("version_scd2", Some(versionScd2Sql), versionScd2),
    QueryDef("corpus_store_read", Some(corpusStoreReadSql), corpusStoreRead),
    QueryDef("store_pruned_read", Some(storePrunedReadSql), storePrunedRead),
    QueryDef("store_time_travel", Some(storeTimeTravelSql), storeTimeTravel),
    QueryDef("store_changes_feed", Some(storeChangesFeedSql), storeChangesFeed),
    QueryDef("store_key_lookup", Some(storeKeyLookupSql), storeKeyLookup),
    QueryDef("store_schema_evolution", Some(storeSchemaEvolutionSql),
      storeSchemaEvolution),
    QueryDef("store_dml_where", Some(storeDmlWhereSql), storeDmlWhere),
    QueryDef("store_cluster_compact", Some(storeClusterCompactSql),
      storeClusterCompact),
    QueryDef("store_minor_compact", Some(storeMinorCompactSql),
      storeMinorCompact),
    QueryDef("store_maintain_policy", Some(storeMaintainPolicySql),
      storeMaintainPolicy),
    QueryDef("pipeline_refresh_store", Some(pipelineRefreshStoreSql),
      pipelineRefreshStore),
    QueryDef("pipeline_incremental_agg", Some(pipelineIncrementalAggSql),
      pipelineIncrementalAgg),
    // read-only budgets of record (prebuilt store, shared oracle SQL)
    QueryDef("store_ro_pruned_read", Some(storePrunedReadSql), storeRoPrunedRead),
    QueryDef("store_ro_key_lookup", Some(storeKeyLookupSql), storeRoKeyLookup),
    QueryDef("store_join_lookup", Some(storeJoinLookupSql), storeJoinLookup),
    QueryDef("store_ro_time_travel", Some(storeTimeTravelSql), storeRoTimeTravel),
    QueryDef("store_ro_changes_feed", Some(storeChangesFeedSql), storeRoChangesFeed),
  )
}
