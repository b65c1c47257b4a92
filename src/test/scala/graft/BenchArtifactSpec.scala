package graft

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/**
 * Loss-proofness of the bench artifact (round-3 headline failure: a
 * SIGKILL 0.2 s before the single end-of-run write would have left
 * `BENCH_r03.json` empty — and a driver timeout DID). The guarantee under
 * test: Bench rewrites the artifact after EVERY timed query via an atomic
 * temp-file move, so a kill at any instant leaves the last complete,
 * parseable JSON on disk. This spec proves the two halves of that
 * guarantee — every prefix of results serializes to parseable JSON with
 * the right partial flag, and the flush is an atomic replace (readers
 * never see a torn file, stale temp files don't accumulate).
 */
class BenchArtifactSpec extends AnyFunSuite {

  private def parse(s: String): JValue = JsonMethods.parse(s)

  test("resultsJson is parseable at every prefix, with partial=true until complete") {
    val all = Seq("q01" -> 1.234, "q02" -> 0.5, "q03" -> 12.75)
    for (n <- 0 to all.size) {
      val prefix = all.take(n)
      val json = parse(Bench.resultsJson(prefix, "/sf", partial = n < all.size))
      assert((json \ "metric") === JString("total"))
      assert((json \ "unit") === JString("sec"))
      assert((json \ "sf") === JString("/sf"))
      assert((json \ "partial") === JBool(n < all.size))
      val qs = (json \ "queries").asInstanceOf[JObject].obj
      assert(qs.map(_._1) === prefix.map(_._1))
      val total = (json \ "value").asInstanceOf[JDouble].num
      assert(math.abs(total - prefix.map(_._2).sum) < 1e-3)
    }
  }

  test("flush atomically replaces the artifact and leaves no temp files") {
    val dir = Files.createTempDirectory("bench-artifact")
    val out = dir.resolve("bench_out.json").toString
    Bench.flush(out, Bench.resultsJson(Seq("q01" -> 1.0), "/sf", partial = true))
    Bench.flush(out, Bench.resultsJson(Seq("q01" -> 1.0, "q02" -> 2.0), "/sf", partial = false))
    val onDisk = Files.readString(Paths.get(out)).trim
    val json = parse(onDisk)
    assert((json \ "partial") === JBool(false))
    assert((json \ "queries").asInstanceOf[JObject].obj.map(_._1) === Seq("q01", "q02"))
    // no .tmp-* residue — a crashed flush can strand at most one, and a
    // successful one must strand none
    val leftovers = Files.list(dir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(leftovers)
      .asScala.map(_.getFileName.toString).toSeq
    assert(names === Seq("bench_out.json"))
  }
}
