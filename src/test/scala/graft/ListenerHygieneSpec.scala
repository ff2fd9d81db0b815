package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-test (round-12 verdict ask #7): no suite may register a raw
  * SparkListener. sbt runs suites in parallel threads inside one forked
  * JVM, so a listener on the shared SparkContext observes EVERY suite's
  * stages — the round-10 SkewStressSpec flake class. All task-metrics
  * collection must go through [[ScopedStageListener]], which owns the
  * job-group attribution + bus-drain defenses (and documents the
  * residual InheritableThreadLocal leak callers must floor against).
  *
  * A grep, not a compile-time rule, because the API is a plain method
  * on SparkContext — but a grep the build runs on every `sbt test`. */
class ListenerHygieneSpec extends AnyFunSuite {

  test("addSparkListener appears only inside ScopedStageListener") {
    val roots = Seq("src/test/scala", "src/main/scala")
      .map(java.nio.file.Paths.get(_))
    assert(roots.forall(java.nio.file.Files.isDirectory(_)),
      s"source roots not found from ${System.getProperty("user.dir")} — " +
        "the forked test JVM must run from the repo root")
    import scala.jdk.CollectionConverters._
    // the CALL shape, not the bare name (this very test talks about the
    // name in strings); concatenated so this file can never self-match
    val call = ".addSpark" + "Listener("
    val offenders = roots.flatMap { root =>
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filterNot(_.getFileName.toString == "ScopedStageListener.scala")
        .filter(p => java.nio.file.Files.readString(p).contains(call))
        .map(_.toString)
    }
    assert(offenders.isEmpty,
      s"raw addSparkListener outside ScopedStageListener: $offenders — " +
        "use ScopedStageListener.measure, which owns the cross-suite " +
        "attribution defenses")
  }
}
