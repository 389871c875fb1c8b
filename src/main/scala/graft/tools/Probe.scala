package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for round-22 measurement (deleted before
  * round end) — times individual pipeline phases with the noop sink. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "16384")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def dyadic = docs.select(col("doc_id").as("vec_id"),
      graft.functions.MediaEmbed.media_embed_dyadic(col("text"), 64, 7).as("v"))
    for (i <- 1 to 3)
      time(s"dyadic-embed noop $i") { noop(dyadic) }
    val vecs = time("dyadic-embed checkpoint") { dyadic.localCheckpoint() }
    val cmodel = time("ivf train (from ckpt)") {
      graft.operators.Similarity.trainIvfModelOnVectors(vecs, 8, 2) }
    for (i <- 1 to 3)
      time(s"assignments from ckpt $i") { noop(
        graft.operators.Similarity.ivfAssignmentsForOnVectors(vecs, cmodel)) }
    for (i <- 1 to 3)
      time(s"assignments from LAZY $i") { noop(
        graft.operators.Similarity.ivfAssignmentsForOnVectors(dyadic, cmodel)) }
    for (i <- 1 to 3)
      time(s"sq codes from ckpt $i") { noop(
        graft.operators.Similarity.sqCodesOnVectors(vecs)) }
    for (i <- 1 to 3)
      time(s"res-sq codes from ckpt $i") { noop(
        graft.operators.Similarity.resSqCodesForOnVectors(vecs, cmodel)) }
    for (i <- 1 to 3)
      time(s"res-sq codes from LAZY $i") { noop(
        graft.operators.Similarity.resSqCodesForOnVectors(dyadic, cmodel)) }
    for (i <- 1 to 3) {
      val pq = time(s"pq train (from ckpt) $i") {
        graft.operators.Similarity.trainPqModelOnVectors(vecs, 8, 16, 2, 64) }
      time(s"pq encode (from ckpt) $i") { noop(
        graft.operators.Similarity.pqCodesAgainstOnVectors(vecs, pq, 8, 64)) }
    }
    // bisect: argmax+join / +residual / +sq over the checkpointed frame
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val cents = cmodel.toDF("cell", "ccv")
    def l2norm(cv: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
      math.sqrt(acc)
    }
    import graft.functions.DotProduct.dot_product
    def asg: DataFrame = {
      val all = vecs.withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      all.withColumn("am", array_max(array(cmodel.map { case (id, cv) =>
          struct(
            coalesce((dot_product(typedlit(cv), col("v")) /
                when(lit(l2norm(cv)) * col("nrm") =!= 0.0,
                  lit(l2norm(cv)) * col("nrm"))),
              lit(-2.0)).as("acos"),
            lit(-id).as("nid"))
        }: _*)))
        .select(col("vec_id"), (-col("am.nid")).as("cell"), col("v"))
    }
    for (i <- 1 to 3)
      time(s"argmax+join only $i") { noop(
        asg.join(broadcast(cents), "cell").select(col("vec_id"), col("v"), col("ccv"))) }
    for (i <- 1 to 3)
      time(s"argmax+join+residual $i") { noop(
        asg.join(broadcast(cents), "cell").select(col("vec_id"),
          graft.functions.ResidualDyadic.residual_dyadic(col("v"), col("ccv")).as("r"))) }
    for (i <- 1 to 3)
      time(s"argmax+join+residual+sq $i") { noop(
        asg.join(broadcast(cents), "cell").select(col("vec_id"),
          graft.functions.SqEncode.sq_encode(
            graft.functions.ResidualDyadic.residual_dyadic(col("v"), col("ccv"))).as("sq"))) }
    spark.stop()
  }
}
