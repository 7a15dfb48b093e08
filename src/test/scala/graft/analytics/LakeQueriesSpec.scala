package graft.analytics

import graft.SparkSpec

class LakeQueriesSpec extends SparkSpec {

  test("q11 from_json native face equals the regexp oracle face row-by-row") {
    val re = LakeQueries.q11JsonProps(spark, sfDir).collect().map(_.toSeq).toSeq
    val native = LakeQueries.q11JsonPropsNative(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(re.nonEmpty)
    assert(native == re, s"faces diverge:\n native=$native\n regexp=$re")
  }
}
