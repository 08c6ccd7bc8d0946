package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-21: RepStats.eval must match the operator chain it replaced
  * (split → size/array_distinct, posexplode → lead → countDistinct) on
  * randomized inputs. Reference computed directly per the old semantics. */
class RepStatsSpec extends AnyFunSuite {

  private def ref(text: String): (Long, Long, Long, Long) = {
    val toks = text.split(" ", -1)
    val pairs = toks.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    (toks.length.toLong, toks.distinct.length.toLong,
      pairs.length.toLong, pairs.distinct.length.toLong)
  }

  private def run(text: String): (Long, Long, Long, Long) = {
    val r = RepStats.eval(UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("matches the reference on randomized docs") {
    val rnd = new scala.util.Random(17)
    val words = Seq("a", "bb", "ccc", "a", "Ü", "été", "", "x9")
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(30)
      val text = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
      assert(run(text) == ref(text), s"text=[$text]")
    }
  }

  test("edge cases: empty string, single token, all-identical") {
    assert(run("") == (1L, 1L, 0L, 0L))
    assert(run("solo") == (1L, 1L, 0L, 0L))
    assert(run("x x x x") == (4L, 1L, 3L, 1L))
    assert(run("  ") == (3L, 1L, 2L, 1L)) // three empty tokens, one bigram kind
  }
}
