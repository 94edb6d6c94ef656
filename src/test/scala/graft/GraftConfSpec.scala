package graft

import graft.engine.GraftConf
import org.scalatest.funsuite.AnyFunSuite

/** The conf registry and the code must agree in BOTH directions: every
  * documented knob is read somewhere in src/main, and every
  * `spark.graft.*` literal in src/main is documented. A rename that
  * touches only one side fails here instead of silently orphaning a
  * knob (the conf would parse, do nothing, and nobody would know).
  */
class GraftConfSpec extends AnyFunSuite {

  private lazy val mainSources: Seq[(String, String)] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    val out = Seq.newBuilder[(String, String)]
    java.nio.file.Files.walk(root).filter(_.toString.endsWith(".scala"))
      .forEach(p => out += (p.toString ->
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
    out.result()
  }

  test("every documented knob is consumed in src/main") {
    GraftConf.knobs.foreach { k =>
      val hits = mainSources.count { case (path, text) =>
        !path.endsWith("GraftConf.scala") && text.contains(k.key)
      }
      assert(hits >= 1, s"knob ${k.key} is documented but nothing reads it")
    }
  }

  test("every spark.graft.* literal in src/main is documented") {
    val pat = """spark\.graft\.[A-Za-z0-9.]+""".r
    val documented = GraftConf.knobs.map(_.key).toSet
    val used = mainSources.flatMap { case (path, text) =>
      if (path.endsWith("GraftConf.scala")) Nil
      else pat.findAllIn(text).toList
    }.toSet
    val undocumented = used.diff(documented)
    assert(undocumented.isEmpty,
      s"confs read in code but missing from GraftConf.knobs: $undocumented")
  }

  test("knob defaults parse where numeric") {
    GraftConf.knobs.foreach { k =>
      val numPart = k.default.takeWhile(c => c.isDigit)
      assert(numPart.nonEmpty, s"${k.key} default must lead with its numeric value")
    }
  }
}
