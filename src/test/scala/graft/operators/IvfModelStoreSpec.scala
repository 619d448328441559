package graft.operators

import graft.{SparkTestBase, Tables}

/** The persisted-model lifecycle contract: float-exact round trip,
  * load-don't-retrain on a valid model, retrain on parameter/corpus
  * mismatch, and bit-identical probes across the train/load boundary. */
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
      dim = Similarity.Dim, iters = 2, seed = Similarity.Seed)
    val Some((loaded, n, d, it, sd)) = IvfModelStore.load(spark, path)
    assert((n, d, it, sd) === ((42L, Similarity.Dim, 2, Similarity.Seed)))
    // the stored model is the float cast; loading must reproduce those
    // exact doubles (float->double is exact, parquet FLOAT is lossless)
    val expected = cents.map(_.map(_.toFloat.toDouble))
    assert(loaded.length === expected.length)
    loaded.zip(expected).foreach { case (l, e) => assert(l.sameElements(e)) }
  }

  test("load returns None when no model exists") {
    assert(IvfModelStore.load(spark, tmpModelPath("never-written")).isEmpty)
  }

  test("ensure loads a valid persisted model instead of retraining") {
    val path = tmpModelPath("load-not-retrain")
    val n = emb.count()
    // persist a deliberately WRONG model with valid metadata: if ensure
    // returns it, it loaded; if it returns the true training output, it
    // retrained and the lifecycle is broken
    val tampered = freshModel().map(_.map(v => v + 1.0))
    IvfModelStore.save(spark, tampered, path, n, Similarity.Dim, 2, Similarity.Seed)
    val got = IvfModelStore.ensure(spark, emb, path, Similarity.Dim, 16, 2, Similarity.Seed)
    val expected = tampered.map(_.map(_.toFloat.toDouble))
    got.zip(expected).foreach { case (g, e) => assert(g.sameElements(e)) }
  }

  test("ensure retrains and overwrites on corpus/parameter mismatch") {
    val path = tmpModelPath("stale-retrain")
    val tampered = freshModel().map(_.map(v => v + 1.0))
    // stale n_vectors: the corpus "changed" since this model was trained
    IvfModelStore.save(spark, tampered, path, nVectors = -1L,
      Similarity.Dim, 2, Similarity.Seed)
    val got = IvfModelStore.ensure(spark, emb, path, Similarity.Dim, 16, 2, Similarity.Seed)
    val expected = freshModel().map(_.map(_.toFloat.toDouble))
    got.zip(expected).foreach { case (g, e) => assert(g.sameElements(e)) }
    // and the overwrite persisted the fresh model with the true count
    val Some((reloaded, n2, _, _, _)) = IvfModelStore.load(spark, path)
    assert(n2 === emb.count())
    reloaded.zip(expected).foreach { case (r, e) => assert(r.sameElements(e)) }
  }

  test("probe with a loaded model is bit-identical to the in-memory probe") {
    val path = tmpModelPath("probe-equiv")
    val cents = freshModel()
    IvfModelStore.save(spark, cents, path, emb.count(), Similarity.Dim, 2, Similarity.Seed)
    val loaded = IvfModelStore.ensure(spark, emb, path, Similarity.Dim, 16, 2, Similarity.Seed)
    val a = Similarity.ivfTopKWith(emb, cents, queryVecId = 0L, k = 10).collect()
    val b = Similarity.ivfTopKWith(emb, loaded, queryVecId = 0L, k = 10).collect()
    assert(a.toSeq === b.toSeq)
  }
}
