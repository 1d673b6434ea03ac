package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Differential checks for the second-continuation operators: each
  * DataFrame pipeline vs an independent driver-side reference on a
  * SEEDED random corpus — the fixed-fixture oracle proves engine
  * parity; these prove the MATH on inputs nobody hand-picked.
  */
class SessionDiffProperties extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new Random(20260813L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private val corpus: Seq[(Long, String)] = (1L to 120L).map { id =>
    val n = 1 + rnd.nextInt(40)
    id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }
  private def docsDf = corpus.toDF("doc_id", "text")

  test("unigram perplexity matches an independent reference on a random corpus") {
    val toks = corpus.flatMap(_._2.split(" "))
    val cnt = toks.groupBy(identity).map { case (t, ts) => t -> ts.length.toDouble }
    val (tTot, v) = (toks.length.toDouble, cnt.size.toDouble)
    def ref(text: String): Double = {
      val ws = text.split(" ")
      val lp = ws.map(w => math.log((cnt(w) + 0.5) / (tTot + 0.5 * v))).sum
      math.exp(-lp / ws.length)
    }
    val got = LmOps.unigramPerplexity(docsDf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    corpus.foreach { case (id, text) =>
      assert(math.abs(got(id) - ref(text)) < 1e-4,
        s"doc $id: got ${got(id)} want ${ref(text)}")
    }
  }

  test("bigram perplexity matches an independent reference on a random corpus") {
    val bg = corpus.flatMap(_._2.split(" ").sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
    val c2 = bg.groupBy(identity).map { case (p, ps) => p -> ps.length.toDouble }
    val c1 = bg.groupBy(_._1).map { case (w, ps) => w -> ps.length.toDouble }
    val v = corpus.flatMap(_._2.split(" ")).distinct.length.toDouble
    def ref(text: String): Option[Double] = {
      val ps = text.split(" ").sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
      if (ps.isEmpty) None
      else Some(math.exp(-ps.map(p => math.log((c2(p) + 0.5) / (c1(p._1) + 0.5 * v))).sum / ps.length))
    }
    val got = LmOps.bigramPerplexity(docsDf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    corpus.foreach { case (id, text) =>
      ref(text) match {
        case None => assert(!got.contains(id), s"single-token doc $id must be absent")
        case Some(want) =>
          assert(math.abs(got(id) - want) < 1e-4, s"doc $id: got ${got(id)} want $want")
      }
    }
  }

  test("chunking invariants on the random corpus: full coverage, exact stride, tail clamp") {
    val got = SparkEntryAccess.query("q_chunk_overlap") // C=64, S=48
    val dir = graft.TestTmp.dir("chunkprop")
    docsDf.write.parquet(dir + "/documents.parquet")
    // reuse the registered query against the random corpus (it reads
    // the documents table from the given dir)
    val rows = got(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = rows.groupBy(_._1)
    corpus.foreach { case (id, text) =>
      val n = text.split(" ").length
      val chunks = byDoc(id).sortBy(_._2)
      val wantChunks = 1 + math.max(0, (math.max(n - 64, 0) + 47) / 48)
      assert(chunks.length == wantChunks, s"doc $id ($n toks): ${chunks.length} chunks")
      chunks.zipWithIndex.foreach { case ((_, cid, ctoks, cmd5), i) =>
        assert(cid == i)
        val start = i * 48
        val want = text.split(" ").slice(start, math.min(start + 64, n))
        assert(ctoks == want.length, s"doc $id chunk $i token count")
        assert(cmd5 == java.security.MessageDigest.getInstance("MD5")
          .digest(want.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, s"doc $id chunk $i content")
      }
    }
  }

  test("semanticDedup matches a brute-force first-win reference on random unit vectors") {
    val vrnd = new Random(7L)
    val vecs = (1L to 60L).map { id =>
      val raw = Array.fill(8)(vrnd.nextGaussian())
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (id, id % 4, raw.map(_ / nrm).toSeq) // 4 clusters, pre-assigned
    }
    val thr = 0.55
    def cos(a: Seq[Double], b: Seq[Double]) =
      math.rint(a.zip(b).map { case (x, y) => x * y }.sum * 1e6) / 1e6 // the round(,6) in the op
    val want = vecs.map { case (id, cl, v) =>
      val dupOf = vecs.filter(o => o._2 == cl && o._1 < id && cos(o._3, v) >= thr)
        .map(_._1).minOption
      id -> dupOf
    }.toMap
    val assigned = vecs.toDF("vec_id", "cluster", "emb").withColumn("norm", lit(1.0))
    val got = SemDedupOps.semanticDedup(assigned, thr)
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.toString.toLong)).toMap
    assert(got == want,
      s"diff: ${got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1)).filter(p => p._1 != p._2)}")
  }
}
