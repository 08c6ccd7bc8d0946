package graft

import org.scalatest.events._
import org.scalatest.funsuite.AnyFunSuite

/** The flake log must NAME a failing test the moment it fails — even if
  * the run is killed right after (the write happens per-event, not at
  * run end). Drives [[FlakeReporter]] with a synthetic TestFailed event
  * against a temp log path. */
class FlakeReporterSpec extends AnyFunSuite {

  test("a TestFailed event lands in the flake log with suite, test " +
    "name and the message head (seed forensics)") {
    val tmp = java.nio.file.Files.createTempFile("graft_flakes_", ".log")
    java.nio.file.Files.delete(tmp) // reporter creates on first append
    val prev = sys.props.get("graft.flakes.path")
    sys.props("graft.flakes.path") = tmp.toString
    try {
      val r = new FlakeReporter
      r(TestFailed(new Ordinal(1), "boom: chaos seed 7 diverged",
        "AuditChaosSpec", "graft.sources.AuditChaosSpec",
        Some("graft.sources.AuditChaosSpec"),
        "seeded chaos run (seed 7)", "seeded chaos run (seed 7)",
        collection.immutable.IndexedSeq.empty, Vector.empty))
      val content = new String(
        java.nio.file.Files.readAllBytes(tmp), "UTF-8")
      assert(content.contains("FAILED"), content)
      assert(content.contains("AuditChaosSpec"), content)
      assert(content.contains("seeded chaos run (seed 7)"), content)
      assert(content.contains("chaos seed 7 diverged"), content)
      // a second failure APPENDS (the log is forensic, never truncated)
      r(TestFailed(new Ordinal(2), "late failure",
        "OtherSpec", "graft.OtherSpec", Some("graft.OtherSpec"),
        "other test", "other test",
        collection.immutable.IndexedSeq.empty, Vector.empty))
      val lines = java.nio.file.Files.readAllLines(tmp)
      assert(lines.size === 2, lines)
    } finally {
      prev match {
        case Some(p) => sys.props("graft.flakes.path") = p
        case None => sys.props -= "graft.flakes.path"
      }
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}
