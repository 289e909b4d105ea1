package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.SparkSpec

/** Runtime pin for the r17 piece-vocab single-pass optimization
  * (OPTIMIZATION_r17.md change 5): [[Corpus.buildPieceVocab]]'s char
  * alphabet projects off the same word-count aggregate as the frequent
  * -word vocab, and a vacuously-true `cnt >= 1` filter keeps the two
  * branches' exchanges canonicalize-equal so AQE's runtime stage cache
  * executes the corpus scan+tokenize map side ONCE. That reuse is
  * RUNTIME-level — the static plan still shows two scan subtrees, and
  * the oracle can't see a second corpus pass — so a Spark upgrade or a
  * conf change (`spark.sql.exchangeReuseEnabled=false`) could silently
  * restore the second pass with no test failing. This spec asserts the
  * job inventory itself: ONE input-reading stage per buildPieceVocab
  * action (r18 verdict item — the test fails when the `cnt >= 1`
  * filter is removed, which was measured to split the branches into
  * two scan+tokenize map stages).
  */
class PieceVocabStageReuseSpec extends SparkSpec {
  import spark.implicits._

  private final class InputStageRecorder extends SparkListener {
    val inputStages = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (e.stageInfo.taskMetrics.inputMetrics.bytesRead > 0)
        inputStages.incrementAndGet()
  }

  test("buildPieceVocab reads and tokenizes the corpus in ONE map stage " +
      "(AQE exchange reuse across the vocab and alphabet branches)") {
    // the corpus must come from storage so the scan stage is
    // identifiable by its input bytes — an in-memory LocalRelation
    // reads nothing
    val dir = java.nio.file.Files.createTempDirectory("graft_pv_reuse_")
    (1L to 200L).map(i => (i, s"alpha beta gamma tok$i delta epsilon"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val rec = new InputStageRecorder
    spark.sparkContext.addSparkListener(rec)
    try {
      val vocab = Corpus.buildPieceVocab(docs, "text", minCount = 2,
        maxSize = 10).collect()
      assert(vocab.nonEmpty)
      // listener events drain asynchronously off the bus
      Thread.sleep(500)
      assert(rec.inputStages.get() == 1,
        s"expected ONE corpus scan+tokenize map stage, saw " +
          s"${rec.inputStages.get()} input-reading stages — the " +
          "cnt >= 1 canonicalization trick (Corpus.buildPieceVocab) or " +
          "AQE exchange reuse has regressed and the corpus is being " +
          "scanned twice per vocab build")
    } finally {
      spark.sparkContext.removeSparkListener(rec)
      graft.store.UpsertWriter.deleteRecursively(dir)
    }
  }
}
