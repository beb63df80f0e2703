package graft

import graft.operators.Decontaminate

/** Decontaminate (benchmark n-gram overlap): the bloom-prefiltered
  * scale variant must equal the broadcast-set gate query exactly
  * (the exact gram join behind the bloom rescues every false
  * positive), and the probe must stay a scan-side filter.
  */
class DecontaminateSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("bloom-prefiltered decontamination equals the broadcast-set result") {
    val exact = rows(Decontaminate.contaminated(spark, SF))
    val bloom = rows(Decontaminate.contaminatedViaBloom(spark, SF))
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("cleaned(θ) partitions the training split: kept ⊎ dirty, θ=0 drops every overlap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val train = Tables.documents(spark, SF)
      .filter(graft.operators.Sampling.bucket($"doc_id", "eval") >= 50)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val overlapping = Decontaminate.contaminated(spark, SF)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // θ=0: any overlap is dirty — kept must be exactly train \ overlapping
    val kept0 = Decontaminate.cleaned(spark, SF, thetaPerMille = 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept0 == train -- overlapping)
    // the gate θ=100‰ keeps a superset of θ=0 and stays inside train
    val kept100 = Decontaminate.cleaned(spark, SF)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept0.subsetOf(kept100) && kept100.subsetOf(train))
    // only sub-threshold-fraction docs were re-admitted (contam_frac
    // is the rounded report column — allow its half-ulp at 4 decimals)
    val readmitted = kept100 -- kept0
    val fracs = Decontaminate.contaminated(spark, SF)
      .filter($"doc_id".isin(readmitted.toSeq: _*))
      .select($"contam_frac").collect().map(_.getDouble(0))
    assert(fracs.forall(_ < 0.1 + 5e-5),
      "a re-admitted doc meets the dirty threshold")
  }

  test("multi-set sweep equals a naive driver-side recomputation on the real corpus") {
    import spark.implicits._
    // independent replica of the md5 bucket + shingle + sweep logic
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((id.toString + "eval").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1000
    }
    val docs = Tables.documents(spark, SF)
      .select($"doc_id", $"text", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(text: String): Set[String] = {
      val t = text.trim.split(" ").map(_.trim).filter(_.nonEmpty)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val evalGrams: Map[Long, Set[String]] = docs
      .filter(d => bucket(d._1) < 75)
      .groupBy(d => bucket(d._1) / 25)
      .map { case (s, ds) => s -> ds.flatMap(d => shingles(d._2)).toSet }
    val train = docs.filter(d => bucket(d._1) >= 75)
    val expected = (for {
      (doc, text, source) <- train
      set <- 0L until 3L
      if shingles(text).exists(evalGrams.getOrElse(set, Set.empty))
    } yield (source, set)).groupBy(identity).view.mapValues(_.length).toMap
    val trainBySource = train.groupBy(_._3).view.mapValues(_.length).toMap
    val got = Decontaminate.contaminatedMulti(spark, SF).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.size == trainBySource.size * 3, "spine must be sources × 3")
    for (((source, set), (nContam, nTrain, ppm)) <- got) {
      assert(nContam == expected.getOrElse((source, set), 0).toLong,
        s"($source, $set): got $nContam")
      assert(nTrain == trainBySource(source).toLong)
      assert(ppm == nContam * 1000000L / nTrain)
    }
    assert(got.values.exists(_._1 > 0L), "sweep found no contamination")
  }

  test("bloom probe is a pre-join scan filter, not a shuffle") {
    val plan = Decontaminate.contaminatedViaBloom(spark, SF)
      .queryExecution.executedPlan.toString
    // pretty-printed as might_contain; it must sit in a Filter on the
    // scan side, i.e. appear in the plan at all (the join alone would
    // not mention it)
    assert(plan.contains("might_contain"))
  }
}
