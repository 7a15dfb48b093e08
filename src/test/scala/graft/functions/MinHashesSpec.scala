package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashesSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq("spark shuffles data", "x").toDF("s")

  test("element i equals md5(concat(lit(s\"i|\"), s)) byte-for-byte") {
    val k = 16
    val native = df.select(MinHashes(col("s"), k).as("a"))
      .as[Seq[String]].collect()
    val builtin = df.select(
      array((0 until k).map(i => md5(concat(lit(s"$i|"), col("s")))): _*).as("a"))
      .as[Seq[String]].collect()
    assert(native.toSeq == builtin.toSeq)
  }

  test("codegen and interpreted modes agree") {
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val r = df.select(MinHashes(col("s"), 4)).as[Seq[String]].collect()
        assert(r.forall(_.length == 4), s"mode=$mode")
        assert(r.head.forall(_.matches("[0-9a-f]{32}")), s"mode=$mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null input yields null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(MinHashes(col("s"), 4)).collect()
    assert(r(0).isNullAt(0))
  }
}
