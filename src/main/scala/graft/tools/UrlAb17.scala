package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlDedup

/** A/B isolating the r17 `normalizeUrl` scheme-guard cost on the
  * NewOps16Scale urlView (the r16 ADVICE fix made the canon expression
  * NULLABLE — the question is what that does to the consumers'
  * evaluate-twice / filter-elimination behavior, because the rich1
  * sweep read q129 at 2.49 s where r16's unguarded form read ~0.68).
  * Variants:
  *  - guarded: the shipped [[UrlDedup.normalizeUrl]] (when(rlike, canon))
  *  - unguarded: the pre-r17 expression (canon unconditionally)
  *  - prefiltered: guard as a WHERE on the raw url, canon unguarded on
  *    survivors (same result set for urlGroups semantics)
  * usage: UrlAb17 <docsDir> [reps] */
object UrlAb17 {
  def main(args: Array[String]): Unit = {
    val docsDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-url-ab17").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$docsDir/documents.parquet")
    val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

    def urlView: DataFrame = {
      val v1 = conv(substring(md5(concat(lit("graft-q129:"),
        col("doc_id").cast("string"))), 1, 2), 16, 10).cast("int")
      val host = concat(lit("site"), (col("doc_id") % 97).cast("string"),
        lit(".example.com"))
      docs.select(col("doc_id"), concat(
        element_at(array(lit("https"), lit("HTTPS")), (v1 % 2) + 1),
        lit("://"),
        when(v1 % 2 === 0, lit("www.")).otherwise(lit("")),
        host,
        lit("/page/"), (col("doc_id") % 1009).cast("string"),
        when(v1 % 3 === 0, lit("/?utm_source=feed&z=1")).otherwise(lit(""))
      ).as("url"))
    }

    // the pre-r17 unconditional canon expression, reproduced verbatim
    def canonUnguarded(url: Column): Column = {
      val TrackingRe = "^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"
      val noFrag = regexp_replace(url, "#.*$", "")
      val base = regexp_extract(noFrag, "^([^?]*)", 1)
      val query = when(noFrag.contains("?"),
        regexp_extract(noFrag, "\\?(.*)$", 1)).otherwise(lit(""))
      val scheme = lower(regexp_extract(base, SchemeRe, 1))
      val host = regexp_replace(regexp_replace(
        lower(regexp_extract(base, SchemeRe + "([^/]*)", 2)),
        "^www\\.", ""), ":(80|443)$", "")
      val path = regexp_replace(
        regexp_extract(base, SchemeRe + "[^/]*(.*)$", 2), "/+$", "")
      val params = array_sort(filter(split(query, "&"),
        p => p =!= lit("") && !p.rlike(TrackingRe)))
      val q = array_join(params, "&")
      concat(scheme, lit("://"), host, path,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
    }

    def groupsOf(canon: DataFrame): DataFrame =
      canon.filter(col("canon_url").isNotNull)
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "guarded_shipped" -> (() =>
        UrlDedup.urlGroups(urlView, "doc_id", "url")),
      "unguarded_pre_r17" -> (() =>
        groupsOf(urlView.select(col("doc_id"),
          canonUnguarded(col("url")).as("canon_url")))),
      "prefiltered" -> (() =>
        groupsOf(urlView.filter(col("url").rlike(SchemeRe))
          .select(col("doc_id"), canonUnguarded(col("url")).as("canon_url")))))

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    variants.foreach { case (_, f) => exec(f()) } // warm-up
    val out = variants.map { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(f())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      f"""\"$name\":${ts.head}%.4f"""
    }.mkString("{", ",", "}")
    println(s"""{"docs_dir":"$docsDir","reps":$reps,"mins":$out}""")
    spark.stop()
  }
}
