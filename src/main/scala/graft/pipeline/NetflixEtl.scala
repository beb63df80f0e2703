package graft.pipeline

import graft.functions.{GenderDict, TextFns}
import graft.operators.SurrogateKey
import graft.sources.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline on its OWN dataset (task.py over
  * netflix_titles.csv), end-to-end Spark-first: the generalized
  * operators (split/trim/explode, dedup, surrogate keys, name split,
  * gender, bridge joins) instantiated against the real 7,787×12 CSV.
  *
  * Output contract mirrors task.py transform (task.py:74-139):
  *  - shows: the fact, original columns minus director/cast/listed_in
  *  - personnel: distinct actor ∪ director names with surrogate id,
  *    first/last split at the first space (task.py:55), gender from
  *    the capitalized first name (task.py:43)
  *  - movie_crew: (personnel_id, show_id, personnel_type) bridge
  *  - listings: (show_id, listing) — the reference does NOT strip
  *    listings (texplod, task.py:84), so neither do we
  *
  * One deliberate deviation, same as the testdata ETL: personnel ids
  * are rank-by-name (SurrogateKey.orderedScalable) instead of the
  * reference's CSV-encounter order (`range(1, n+1)`, task.py:100) —
  * encounter order is a single-threaded-scan artifact with no
  * distributed meaning; rank-by-name is deterministic at any
  * parallelism.
  */
object NetflixEtl {

  /** netflix_titles.csv columns (reference extract, task.py:69). */
  val schema: StructType = StructType(Seq(
    StructField("show_id", StringType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("director", StringType),
    StructField("cast", StringType),
    StructField("country", StringType),
    StructField("date_added", StringType),
    StructField("release_year", IntegerType),
    StructField("rating", StringType),
    StructField("duration", StringType),
    StructField("listed_in", StringType),
    StructField("description", StringType)))

  def extract(spark: SparkSession, path: String): DataFrame =
    Readers.csv(spark, path, schema, dateCols = Seq("date_added"),
      dateFormat = "MMMM d, yyyy", multiLine = true)

  /** (show_id, name) pairs from one multi-value column, split on
    * comma, trimmed, nulls/empties dropped (task.py:74-88).
    */
  private def explodeNames(shows: DataFrame, column: String): DataFrame = {
    import shows.sparkSession.implicits._
    shows.select($"show_id", explode(split(col(column), ",")).as("raw"))
      .select($"show_id", trim($"raw").as("name"))
      .filter($"name".isNotNull && length($"name") > 0)
  }

  case class Star(shows: DataFrame, personnel: DataFrame,
      movieCrew: DataFrame, listings: DataFrame)

  def transform(shows: DataFrame): Star = {
    import shows.sparkSession.implicits._

    val actors = explodeNames(shows, "cast")
    val directors = explodeNames(shows, "director")

    // personnel: distinct names over both roles, ordered surrogate id,
    // first/last split + gender (task.py:90-110)
    val names = actors.select($"name").union(directors.select($"name")).distinct()
    // gender via the broadcast dictionary with the reference's
    // category mapping (task.py:43-51) — the testdata ETL keeps the
    // oracle-expressible suffix heuristic; here, on real names, the
    // dictionary is the higher-fidelity mirror of gender_guesser
    val withId = SurrogateKey.orderedScalable(names, "name", "id")
      .withColumn("first_name", TextFns.firstWord($"name"))
      .withColumn("last_name", TextFns.restWords($"name"))
    val personnel = GenderDict.enrich(withId, $"name",
        GenderDict.dictDf(shows.sparkSession))
      .select($"id", $"name", $"first_name", $"last_name", $"gender")

    // movie_crew: both exploded role tables tagged and joined back to
    // the dim on the natural key; dim broadcast, facts never shuffle
    // (task.py:112-131)
    val crewRaw = actors.withColumn("personnel_type", lit("cast"))
      .union(directors.withColumn("personnel_type", lit("director")))
    val movieCrew = crewRaw
      .join(broadcast(personnel.select($"id", $"name")), "name")
      .select($"id".as("personnel_id"), $"show_id", $"personnel_type")

    // listings: exploded but NOT stripped, exactly like texplod
    // (task.py:84,133-135)
    val listings = shows
      .select($"show_id", explode(split($"listed_in", ",")).as("listing"))
      .filter($"listing".isNotNull)

    val showsOut = shows.drop("director", "cast", "listed_in")
    Star(showsOut, personnel, movieCrew, listings)
  }

  /** extract → transform → star load through any [[graft.sources.TableSink]]
    * (≙ task.py run; pass a JdbcSink for the reference's literal
    * to_sql target). Returns the star for assertion/reuse.
    */
  def runAndLoad(spark: SparkSession, csvPath: String,
      sink: graft.sources.TableSink): Star = {
    val star = transform(extract(spark, csvPath))
    graft.sources.StarSchemaSink.writeTo(sink,
      fact = ("shows", star.shows, Nil),
      dims = Seq("personnel" -> star.personnel,
        "movie_crew" -> star.movieCrew, "listings" -> star.listings))
    star
  }

  def runAndLoad(spark: SparkSession, csvPath: String, outDir: String): Star =
    runAndLoad(spark, csvPath, new graft.sources.ParquetSink(outDir))
}
