package graft

import org.scalatest.Reporter
import org.scalatest.events._

/** Persists every test FAILURE/ABORT to `_FLAKES.log` the moment it
  * happens — so a one-off flake in a long suite run can never again be
  * reported as "a single test flaked once (name not captured)". The log
  * survives the run (appended, never truncated); a green round leaves it
  * untouched. Registered via `Test / testOptions` in build.sbt, so every
  * `sbt test` / `testOnly` invocation carries it.
  *
  * Each line: ISO instant, suite, test name, first line of the message
  * (chaos seeds live in test names and messages, so the seed that drove
  * a randomized failure is captured verbatim).
  */
class FlakeReporter extends Reporter {
  private def note(kind: String, suite: String, test: String,
      msg: String): Unit = try {
    val head = msg.linesIterator.take(1).mkString.take(400)
    val line = s"${java.time.Instant.now()} $kind $suite :: $test :: $head\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.props.getOrElse("graft.flakes.path", "_FLAKES.log")),
      line.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  } catch { case _: Throwable => () } // never let logging fail a run

  override def apply(event: Event): Unit = event match {
    case e: TestFailed =>
      note("FAILED", e.suiteName, e.testName, e.message)
    case e: TestCanceled =>
      note("CANCELED", e.suiteName, e.testName, e.message)
    case e: SuiteAborted =>
      note("ABORTED", e.suiteName, "(suite)", e.message)
    case e: RunAborted =>
      note("RUN-ABORTED", "(run)", "(run)", e.message)
    case _ => ()
  }
}
