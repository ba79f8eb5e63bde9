package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression gate's previous-round parsing — the gate ran
  * BLIND in r10 because BENCH_r09.json's driver-side tail truncation cut
  * off the `{"metric"` prefix the primary parse anchored on, `prevNode`
  * silently resolved to None, and three real deltas (p78 9.2x among them)
  * sailed through unflagged. These tests hold the recovery path to the
  * REAL artifacts in the repo root, so any future change to the driver's
  * truncation behavior that re-blinds the gate fails a test instead of
  * failing silently. */
class BenchPrevSpec extends AnyFunSuite {
  private val sf01 = "/root/testdata/sf0.1"

  test("recovers the r09 bench line from its truncated tail") {
    val f = new java.io.File("BENCH_r09.json")
    assume(f.isFile, "BENCH_r09.json not present")
    // precondition that MAKES this the regression case: the primary
    // anchor is truncated away
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath))
    assume(!raw.contains("{\\\"metric\\\""),
      "r09 tail regained its prefix — test fixture drifted")
    val node = BenchPrev.nodeOf(f)
    assert(node.isDefined, "truncated r09 tail must reconstruct")
    val n = node.get
    assert(BenchPrev.comparable(n, sf01, isolate = false))
    // unlabeled (pre-r12) artifacts are in-process by history — an
    // isolated gate must never trust one
    assert(!BenchPrev.comparable(n, sf01, isolate = true))
    // spot-check values against the known r9 numbers
    assert(n.get("queries").get("p78_tfrecord_shards").asDouble() == 0.217)
    assert(n.get("queries").get("p71_span_removal").asDouble() == 1.994)
    assert(n.get("spread").get("p78_tfrecord_shards").asDouble() == 0.013)
    assert(n.get("queries").size() >= 20)
  }

  test("parses the r10 bench line via the whole-line path") {
    val f = new java.io.File("BENCH_r10.json")
    assume(f.isFile, "BENCH_r10.json not present")
    val node = BenchPrev.nodeOf(f)
    assert(node.isDefined)
    assert(BenchPrev.comparable(node.get, sf01, isolate = false))
    assert(node.get.get("queries").get("p78_tfrecord_shards").asDouble() == 1.995)
  }

  test("own-line sidecar, sf mismatch, and garbage inputs") {
    def tmpWith(content: String): java.io.File = {
      val f = java.io.File.createTempFile("benchprev", ".json")
      f.deleteOnExit()
      java.nio.file.Files.write(f.toPath, content.getBytes)
      f
    }
    // a BENCH_LAST.json sidecar is Bench's own line at the root
    val own = tmpWith(
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q01":0.5},"spread":{"q01":0.1},"sf":"/root/testdata/sf0.1"}""")
    val n = BenchPrev.nodeOf(own)
    assert(n.isDefined && BenchPrev.comparable(n.get, sf01, isolate = false))
    assert(n.get.get("queries").get("q01").asDouble() == 0.5)
    // a different scale factor is recoverable but NOT comparable
    val otherSf = tmpWith(
      """{"tail":"...,\"queries\":{\"q01\":0.5},\"spread\":{\"q01\":0.1},\"sf\":\"/root/testdata/sf0.01\"}"}""")
    val o = BenchPrev.nodeOf(otherSf)
    assert(o.isDefined && !BenchPrev.comparable(o.get, sf01, isolate = false))
    // a tail with no recoverable queries object yields None, not a throw
    assert(BenchPrev.nodeOf(tmpWith("""{"tail":"no json here"}""")).isEmpty)
    assert(BenchPrev.nodeOf(tmpWith("not json at all")).isEmpty)
    assert(BenchPrev.nodeOf(new java.io.File("/nonexistent")).isEmpty)
    // unbalanced truncation INSIDE the queries object: refuse, don't guess
    assert(BenchPrev.nodeOf(
      tmpWith("""{"tail":"...,\"queries\":{\"q01\":0.5,\"q02\":"}""")).isEmpty)
  }

  test("unjudgeable declarations survive tail reconstruction") {
    // a truncated prev must still say which of its bands were vacuous —
    // otherwise the NEXT run would trust a band the prev itself disowned
    val tail = """...,"queries":{"q01":0.5,"p03":3.345},""" +
      """"spread":{"q01":0.1,"p03":2.248},"unjudgeable":["p03"],""" +
      """"sf":"/root/testdata/sf0.1"}"""
    val n = BenchPrev.reconstructFromTail(tail)
    assert(n.isDefined)
    assert(n.get.get("unjudgeable").get(0).asText() == "p03")
    // absent array: reconstruct still succeeds, field simply missing
    val bare = BenchPrev.reconstructFromTail(
      """...,"queries":{"q01":0.5},"sf":"/root/testdata/sf0.1"}""")
    assert(bare.isDefined && bare.get.get("unjudgeable") == null)
    // truncation inside the array: the field is dropped, queries survive
    val cut = BenchPrev.reconstructFromTail(
      """...,"queries":{"q01":0.5},"unjudgeable":["p03""")
    assert(cut.isDefined && cut.get.get("unjudgeable") == null)
  }

  test("instrument label gates comparability, incl. through reconstruction") {
    val sf = "/root/testdata/sf0.1"
    // a labeled isolated artifact is comparable ONLY to an isolated run
    val iso = BenchPrev.reconstructFromTail(
      s"""...,"queries":{"q01":0.5},"isolate":true,"sf":"$sf"}""").get
    assert(BenchPrev.comparable(iso, sf, isolate = true))
    assert(!BenchPrev.comparable(iso, sf, isolate = false))
    // labeled in-process: only to an in-process run
    val inp = BenchPrev.reconstructFromTail(
      s"""...,"queries":{"q01":0.5},"isolate":false,"sf":"$sf"}""").get
    assert(!BenchPrev.comparable(inp, sf, isolate = true))
    assert(BenchPrev.comparable(inp, sf, isolate = false))
  }

  test("unjudgeable threshold: vacuous bands flagged, wobble floored") {
    // the r11 disease case: p03 published 3.345 with spread 2.248
    assert(Bench.unjudgeable(3.345, 2.248))
    // the r10 disease case: p71 spread 11.2 on a ~3.6 s line
    assert(Bench.unjudgeable(3.6, 11.2))
    // a healthy band: spread well under half the min
    assert(!Bench.unjudgeable(3.345, 0.4))
    // sub-100ms wobble on a constant-folded probe is NOT blindness —
    // the 0.2 s absolute floor keeps tiny lines judgeable
    assert(!Bench.unjudgeable(0.13, 0.07))
    assert(Bench.unjudgeable(0.13, 0.25))
    // failed measurements are never unjudgeable (they are already -1)
    assert(!Bench.unjudgeable(-1.0, 0.0))
  }

  test("isolation fork end-to-end: a real child JVM measures one query") {
    // the pure pins below cover parsing and command shape; this covers
    // the ProcessBuilder plumbing itself — env overlay, classpath
    // inheritance from the forked test JVM, stdout capture — with ONE
    // cheap query at sf0.001 so the fork costs seconds, not minutes
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "testdata not present")
    val (v, s) = BenchIsolate.measure("q02_filter_agg", 1, Map(
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_CPUS" -> "8"))
    assert(v > 0, s"isolated child returned $v")
    assert(v < 60, s"q02 at sf0.001 took $v s — fork plumbing suspect")
    assert(s >= 0)
    // an unknown query name yields the degrade-to-(-1) path, not a throw
    val (bad, _) = BenchIsolate.measure("no_such_query", 1, Map(
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_CPUS" -> "8"))
    assert(bad == -1.0)
  }

  test("isolation child output parsing and command shape") {
    // the LAST parseable line carrying the key wins; logging noise,
    // partial lines, and other-key lines are skipped
    val out =
      """some spark INFO noise
        |{"metric":"total","queries":{"other":9.9},"spread":{"other":0.1}}
        |{"metric":"total","value":0.5,"unit":"sec","queries":{"p03":0.444},"spread":{"p03":0.021},"sf":"x"}
        |trailing noise""".stripMargin
    assert(BenchIsolate.parseChildLine(out, "p03").contains((0.444, 0.021)))
    // a missing spread defaults to 0, value still parsed
    assert(BenchIsolate.parseChildLine(
      """{"queries":{"p03":1.5}}""", "p03").contains((1.5, 0.0)))
    // no line carries the key → None, not a throw
    assert(BenchIsolate.parseChildLine(out, "p45").isEmpty)
    assert(BenchIsolate.parseChildLine("garbage", "p03").isEmpty)
    // command: same JVM, same flags, same classpath, Bench main
    val cmd = BenchIsolate.childCommand("/jvm", Seq("--add-opens", "x=y",
      "-Xmx8g"), "/cp/classes:/cp/spark.jar")
    assert(cmd.head == "/jvm/bin/java")
    assert(cmd.containsSlice(Seq("--add-opens", "x=y")))
    assert(cmd.containsSlice(Seq("-cp", "/cp/classes:/cp/spark.jar")))
    assert(cmd.last == "graft.Bench")
  }

  test("compact stdout line fits the driver's 2000-char tail capture") {
    // r19 (verdict ask #1): PERF_r{16..18}.json carried "parsed": null
    // because the full bench record outgrew the driver's tail window.
    // The full-set stdout line is now the compact form — pin its budget
    // against the REAL headline set (plus b8), with worst-case 7-char
    // values, leaving ~100 chars of headroom for sbt's epilogue inside
    // a 2000-char tail.
    val keys = Bench.headline :+ "b8_stream_roundtrip"
    val qs = keys.map("\"" + _ + "\":" + "999.999").mkString("{", ",", "}")
    val line = Bench.compactLine(9999.999, qs, 5, isolate = false,
      "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"compact line is ${line.length} chars")
    // and it must parse as a comparable prev on its own (the driver's
    // BENCH_r{N}.json wrapper embeds exactly this line in its tail)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(line)
    assert(n.get("metric").asText() == "total")
    assert(n.get("unit").asText() == "sec")
    assert(n.get("value").isNumber)
    assert(n.get("queries").size() == keys.size)
    assert(BenchPrev.comparable(n, "/root/testdata/sf0.1", isolate = false))
    // tail reconstruction (the driver wrapper path) keeps sf + isolate
    val rec = BenchPrev.reconstructFromTail(line)
    assert(rec.isDefined && BenchPrev.comparable(rec.get,
      "/root/testdata/sf0.1", isolate = false))
  }

  test("instruments never cross-gate: latestRoundFile picks per mode") {
    def f(n: String) = new java.io.File(n)
    val files = Seq(f("BENCH_r11.json"), f("BENCH_r12.json"),
      f("BENCH_ISOLATED_r12.json"), f("BENCH_ISOLATED_r12b.json"),
      f("BENCH_LAST.json"), f("CORRECTNESS_r12.json"), f("notes.md"))
    // in-process mode sees only BENCH_r{N}, newest round
    assert(BenchPrev.latestRoundFile(files, isolate = false)
      .map(_.getName).contains("BENCH_r12.json"))
    // isolate mode sees only BENCH_ISOLATED_*, and the same-round
    // re-measure suffix (r12b) supersedes the base artifact (r12)
    assert(BenchPrev.latestRoundFile(files, isolate = true)
      .map(_.getName).contains("BENCH_ISOLATED_r12b.json"))
    // a newer round beats any suffix of an older one
    assert(BenchPrev.latestRoundFile(
      files :+ f("BENCH_ISOLATED_r13.json"), isolate = true)
      .map(_.getName).contains("BENCH_ISOLATED_r13.json"))
    assert(BenchPrev.latestRoundFile(Nil, isolate = true).isEmpty)
  }
}
