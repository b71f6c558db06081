package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-check that `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * installs the engine's functions into a plain spark-submit session:
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions \
  *     --class graft.tools.SqlSmoke <jar>
  */
object SqlSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    val r = spark.sql(
      """SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS c,
         vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
         minhash_md5(array('a b c')) AS mh,
         simhash_md5(array('tok')) AS sh""").collect()(0)
    println(s"""{"smoke":"extensions","intersect":${r.getInt(0)},"dot":${r.getDouble(1)},""" +
      s""""minhash_len":${r.getSeq[String](2).size},"simhash_bits":${r.getString(3).length}}""")
    assert(r.getInt(0) == 2 && r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2).size == 16 && r.getString(3).length == 32)
    spark.stop()
  }
}
