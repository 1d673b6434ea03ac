package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The reference's tenacity policy (connection.py:125-129) as specs:
  * 3 attempts, exponential 1→10 s, retry only the transient class.
  */
class RetrySpec extends AnyFunSuite {

  test("succeeds on the attempt after transient failures, with the tenacity backoff schedule") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val got = Retry.withBackoff(attempts = 3, sleeper = ms => { sleeps += ms; () }) {
      calls += 1
      if (calls < 3) throw new java.io.IOException(s"transient $calls")
      42
    }
    assert(got == 42 && calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L), "wait_exponential: 2^(k-1)s, min 1s")
  }

  test("gives up after the attempt cap and rethrows the LAST failure") {
    var calls = 0
    val e = intercept[java.io.IOException] {
      Retry.withBackoff(attempts = 3, sleeper = _ => ()) {
        calls += 1
        throw new java.io.IOException(s"always $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "always 3")
  }

  test("non-retryable failures propagate immediately") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff(
        attempts = 3,
        retryOn = _.isInstanceOf[java.io.IOException],
        sleeper = _ => ()) {
        calls += 1
        throw new IllegalArgumentException("deterministic — retrying just triples the cost")
      }
    }
    assert(calls == 1)
  }

  test("backoff caps at 10s like wait_exponential(max=10)") {
    assert((1 to 6).map(Retry.expBackoffMs(_)) ==
      Seq(1000L, 2000L, 4000L, 8000L, 10000L, 10000L))
  }
}
