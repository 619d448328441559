package graft.operators

import graft.{SparkTestBase, Tables}

/** The persisted-model lifecycle contract: float-exact round trip,
  * load-don't-retrain on a valid model, retrain on parameter/corpus
  * mismatch — including a SAME-cardinality content rewrite, which only
  * the content fingerprint can catch — and bit-identical probes across
  * the train/load boundary. */
class IvfModelStoreSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  private def freshModel() = Similarity.ivfCentroids(
    emb, Similarity.Dim, c = 16, iters = 2, seed = Similarity.Seed)

  private def tmpModelPath(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-test-models/$tag.parquet"

  test("save/load round-trips the float-cast model exactly") {
    val cents = freshModel()
    val path = tmpModelPath("roundtrip")
    IvfModelStore.save(spark, cents, path, nVectors = 42L,
      dim = Similarity.Dim, iters = 2, seed = Similarity.Seed, fp = 99L)
    val Some((loaded, n, d, it, sd, fp)) = IvfModelStore.load(spark, path)
    assert((n, d, it, sd, fp) === ((42L, Similarity.Dim, 2, Similarity.Seed, 99L)))
    // the stored model is the float cast; loading must reproduce those
    // exact doubles (float->double is exact, parquet FLOAT is lossless)
    val expected = cents.map(_.map(_.toFloat.toDouble))
    assert(loaded.length === expected.length)
    loaded.zip(expected).foreach { case (l, e) => assert(l.sameElements(e)) }
  }

  test("load returns None when no model exists") {
    assert(IvfModelStore.load(spark, tmpModelPath("never-written")).isEmpty)
  }

  test("load treats a pre-fingerprint model (no fp column) as absent") {
    import spark.implicits._
    val path = tmpModelPath("legacy-schema")
    // the r8 on-disk schema: no fp column — provenance can't be
    // revalidated, so the model must read as stale, not be trusted
    Seq((0, Seq(1.0f, 2.0f), 10L, 2, 2, 7L))
      .toDF("cluster_id", "centroid", "n_vectors", "dim", "iters", "seed")
      .write.mode("overwrite").parquet(path)
    assert(IvfModelStore.load(spark, path).isEmpty)
  }

  test("ensure loads a valid persisted model instead of retraining") {
    val path = tmpModelPath("load-not-retrain")
    val n = emb.count()
    val fp = IvfModelStore.fingerprint(emb)
    // persist a deliberately WRONG model with valid metadata: if ensure
    // returns it, it loaded; if it returns the true training output, it
    // retrained and the lifecycle is broken
    val tampered = freshModel().map(_.map(v => v + 1.0))
    IvfModelStore.save(spark, tampered, path, n, Similarity.Dim, 2,
      Similarity.Seed, fp)
    val got = IvfModelStore.ensure(spark, emb, path, Similarity.Dim, 16, 2, Similarity.Seed)
    val expected = tampered.map(_.map(_.toFloat.toDouble))
    got.zip(expected).foreach { case (g, e) => assert(g.sameElements(e)) }
  }

  test("ensure retrains and overwrites on corpus/parameter mismatch") {
    val path = tmpModelPath("stale-retrain")
    val tampered = freshModel().map(_.map(v => v + 1.0))
    // stale n_vectors: the corpus "changed" since this model was trained
    IvfModelStore.save(spark, tampered, path, nVectors = -1L,
      Similarity.Dim, 2, Similarity.Seed, IvfModelStore.fingerprint(emb))
    val got = IvfModelStore.ensure(spark, emb, path, Similarity.Dim, 16, 2, Similarity.Seed)
    val expected = freshModel().map(_.map(_.toFloat.toDouble))
    got.zip(expected).foreach { case (g, e) => assert(g.sameElements(e)) }
    // and the overwrite persisted the fresh model with the true count
    val Some((reloaded, n2, _, _, _, fp2)) = IvfModelStore.load(spark, path)
    assert(n2 === emb.count())
    assert(fp2 === IvfModelStore.fingerprint(emb))
    reloaded.zip(expected).foreach { case (r, e) => assert(r.sameElements(e)) }
  }

  test("ensure retrains when the corpus is rewritten in place at the SAME " +
    "cardinality (content fingerprint catches what row count cannot)") {
    import org.apache.spark.sql.functions._
    val path = tmpModelPath("content-stale")
    val n = emb.count()
    // a "regenerated with another seed" corpus: same rows, same vec_ids,
    // different embedding content
    val rewritten = emb.withColumn("embedding",
      transform(col("embedding"), v => -v))
    // model trained on the ORIGINAL corpus, metadata all matching except
    // the content fingerprint — the exact silent-stale scenario
    val orig = freshModel()
    IvfModelStore.save(spark, orig, path, n, Similarity.Dim, 2,
      Similarity.Seed, IvfModelStore.fingerprint(emb))
    val got = IvfModelStore.ensure(spark, rewritten, path,
      Similarity.Dim, 16, 2, Similarity.Seed)
    val stale = orig.map(_.map(_.toFloat.toDouble))
    assert(!got.zip(stale).forall { case (g, s) => g.sameElements(s) },
      "ensure returned the stale model for rewritten corpus content")
    // and the store now carries the rewritten corpus's fingerprint
    val Some((_, _, _, _, _, fp2)) = IvfModelStore.load(spark, path)
    assert(fp2 === IvfModelStore.fingerprint(rewritten))
  }

  test("invalidate removes every persisted model for a dir") {
    val d = "/some/corpus/dir"
    Seq(16, 64).foreach { c =>
      IvfModelStore.save(spark, freshModel(), IvfModelStore.defaultPath(d, c),
        10L, Similarity.Dim, 2, Similarity.Seed, 0L)
    }
    assert(IvfModelStore.load(spark, IvfModelStore.defaultPath(d, 16)).nonEmpty)
    IvfModelStore.invalidate(spark, d)
    assert(IvfModelStore.load(spark, IvfModelStore.defaultPath(d, 16)).isEmpty)
    assert(IvfModelStore.load(spark, IvfModelStore.defaultPath(d, 64)).isEmpty)
  }

  test("probe with a loaded model is bit-identical to the in-memory probe") {
    val path = tmpModelPath("probe-equiv")
    val cents = freshModel()
    IvfModelStore.save(spark, cents, path, emb.count(), Similarity.Dim, 2,
      Similarity.Seed, IvfModelStore.fingerprint(emb))
    val loaded = IvfModelStore.ensure(spark, emb, path, Similarity.Dim, 16, 2, Similarity.Seed)
    val a = Similarity.ivfTopKWith(emb, cents, queryVecId = 0L, k = 10).collect()
    val b = Similarity.ivfTopKWith(emb, loaded, queryVecId = 0L, k = 10).collect()
    assert(a.toSeq === b.toSeq)
  }
}
