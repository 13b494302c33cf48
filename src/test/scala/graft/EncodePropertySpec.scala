package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.KafkaRecord
import graft.operators.Encode

/** Property tests for the F2 encoder — the richest pure logic in the
  * reference (SURVEY §7.1 step 2): for arbitrary payload bytes the
  * sniff-encode must be losslessly invertible and its tag truthful.
  */
class EncodePropertySpec extends SparkSpec {

  /** Deterministic sampling in place of the scalatest-scalacheck bridge
    * (not on the offline classpath): 60 values from fixed seeds.
    */
  private def forAllSampled(gen: Gen[String], n: Int = 60)(check: String => Unit): Unit =
    Iterator.iterate(Seed(42L))(_.next).take(n)
      .map(seed => gen.pureApply(Gen.Parameters.default, seed))
      .foreach(check)
  import spark.implicits._

  private val payloadGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.chooseNum(-1000000, 1000000).map(n => s"""{"n": $n}"""),
    Gen.alphaNumStr.map(s => s"""["$s", 1, null]"""),
    Gen.const(""),
    Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toChar).mkString)
  )

  private def encodeOne(value: String): (String, String) = {
    val rec = KafkaRecord("t", 0, 0, new Timestamp(0L), Array.emptyByteArray,
      value.getBytes("UTF-8"), Map.empty)
    val row = Encode.jsonLinesProjection(Seq(rec).toDF()).collect()(0)
    (row.getAs[String]("value_out"), row.getAs[String]("value_format"))
  }

  test("encode is lossless: base64-tagged payloads decode back to the original bytes") {
    forAllSampled(payloadGen) { value =>
      val (out, tag) = encodeOne(value)
      if (value.isEmpty) {
        assert(out == null && tag == null) // omitted, s3.rs:238
      } else tag match {
        case "base64" =>
          val decoded = new String(java.util.Base64.getDecoder.decode(out), "UTF-8")
          assert(decoded == new String(value.getBytes("UTF-8"), "UTF-8"))
        case "json" =>
          assert(out == value) // JSON passes through verbatim
        case other => fail(s"unexpected tag $other")
      }
    }
  }

  test("the json tag is truthful: tagged payloads parse as JSON") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    forAllSampled(payloadGen) { value =>
      val (_, tag) = encodeOne(value)
      if (tag == "json") {
        // must be parseable where the reference's serde_json would parse it
        mapper.readTree(value): Unit
        assert(true)
      }
    }
  }
}
