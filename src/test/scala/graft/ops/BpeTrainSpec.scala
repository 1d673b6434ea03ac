package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed BPE training vs an independent single-threaded reference
  * implementation, plus determinism and compression properties.
  */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference BPE: the textbook sequential algorithm over a word-count
    * map (implemented independently of the Dataset version).
    */
  private def referenceBpe(words: Map[String, Long], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    var tbl: Map[Seq[String], Long] =
      words.map { case (w, n) => (w.map(_.toString) :+ "</w>") -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- tbl; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption.filter(_._2 >= minCount)
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          out += ((a, b))
          tbl = tbl.groupMapReduce { case (syms, _) => BpeTrain.mergePair(syms, a, b) }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    (1L, "low low low low low lower lower newest newest newest"),
    (2L, "newest newest newest widest widest widest low lower"),
    (3L, "newest widest low low"))

  test("learned merges equal the sequential reference, under any partitioning") {
    val docs = corpus.toDF("doc_id", "text")
    val wordMap = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val want = referenceBpe(wordMap, 12, minCount = 2)
    assert(want.nonEmpty && want.size >= 8, s"reference produced ${want.size} merges")
    val got1 = BpeTrain.learnMerges(docs.repartition(1), 12, minCount = 2)
    val got8 = BpeTrain.learnMerges(docs.repartition(8), 12, minCount = 2)
    assert(got1 == want, s"got $got1\nwant $want")
    assert(got8 == want, "partitioning must not change training")
  }

  test("tokenizing with learned merges compresses the corpus and round-trips content") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, 16, minCount = 2)
    val toks = BpeTrain.tokenize(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // compression: far fewer symbols than raw characters (+1 per word
    // for the </w> marker the untrained encoding would carry)
    val symCount = toks.values.map(_.size).sum
    val rawSyms = corpus.map(_._2.split(" ").filter(_.nonEmpty).map(_.length + 1).sum).sum
    assert(symCount < rawSyms / 2, s"BPE must compress: $symCount symbols vs $rawSyms chars")
    // round-trip: concatenating each doc's tokens (dropping the markers)
    // reproduces the original text
    corpus.foreach { case (id, text) =>
      val rebuilt = toks(id).mkString("").replace("</w>", " ").trim
      assert(rebuilt == text, s"doc $id: $rebuilt")
    }
  }
}
