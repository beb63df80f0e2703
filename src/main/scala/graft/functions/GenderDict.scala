package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary-based gender enrichment with the reference's category
  * semantics (task.py:43-51): the underlying dictionary classifies a
  * first name as male / female / mostly_male / mostly_female / andy
  * (androgynous), and the pipeline maps mostly_male→male,
  * mostly_female→female, andy→unknown, anything unmatched→unknown.
  *
  * The reference uses the gender_guesser package's data file; that
  * file isn't shippable here, so [[entries]] is a curated sample of
  * common given names (public knowledge) in the same category
  * vocabulary. The operator contract — broadcast dictionary join on
  * the lowercased first name, then the category mapping — is exactly
  * the reference's, and swapping in a fuller dictionary is a
  * one-argument change ([[enrich]] takes any (name, category) frame).
  *
  * At scale this is the right shape: the dictionary is a few MB
  * broadcast once; the corpus side never shuffles and the join stays
  * inside whole-stage codegen.
  */
object GenderDict {

  /** (lowercased first name, gender_guesser-style category). */
  val entries: Seq[(String, String)] = Seq(
    // male
    "james", "john", "robert", "michael", "william", "david", "richard",
    "joseph", "thomas", "charles", "daniel", "matthew", "anthony", "mark",
    "steven", "paul", "andrew", "joshua", "kenneth", "kevin", "brian",
    "george", "edward", "ronald", "timothy", "jason", "jeffrey", "ryan",
    "jacob", "nicholas", "eric", "jonathan", "stephen", "justin", "scott",
    "brandon", "benjamin", "samuel", "gregory", "alexander", "patrick",
    "jack", "dennis", "tyler", "aaron", "henry", "peter", "carl", "arthur",
    "harold", "raj", "amit", "salman", "akshay", "shah", "martin", "luis",
    "carlos", "juan", "diego", "hiroyuki", "takeshi", "omar", "adam",
    "simon", "marc", "bruno", "pedro", "sergio", "vikram", "anil",
    "naseeruddin", "paresh", "ajay", "arjun", "rahul", "sanjay").map(_ -> "male") ++
    Seq(
    // female
    "mary", "patricia", "jennifer", "linda", "elizabeth", "barbara",
    "susan", "jessica", "sarah", "karen", "nancy", "lisa", "margaret",
    "sandra", "ashley", "kimberly", "emily", "donna", "michelle", "carol",
    "amanda", "melissa", "deborah", "stephanie", "rebecca", "laura",
    "sharon", "cynthia", "kathleen", "amy", "angela", "helen", "anna",
    "brenda", "pamela", "nicole", "emma", "samantha", "katherine",
    "christine", "rachel", "catherine", "carolyn", "janet", "maria",
    "heather", "diane", "julie", "victoria", "olivia", "christina",
    "lauren", "megan", "kate", "kajol", "priyanka", "deepika", "aishwarya",
    "sofia", "lucia", "yuki", "mei", "fatima", "leila", "ingrid",
    "monica", "paula", "carmen", "juliette", "bianca", "vaneza",
    "shilpa", "rani", "madhuri", "sridevi").map(_ -> "female") ++
    Seq(
    // mostly_male / mostly_female / andy — the categories the
    // reference's mapping collapses (task.py:45-50)
    "chris" -> "mostly_male", "terry" -> "mostly_male",
    "jean" -> "mostly_male", "lee" -> "mostly_male",
    "noel" -> "mostly_male", "jaime" -> "mostly_male",
    "andrea" -> "mostly_female", "kim" -> "mostly_female",
    "dana" -> "mostly_female", "shannon" -> "mostly_female",
    "carey" -> "mostly_female", "ariel" -> "mostly_female",
    "robin" -> "andy", "jordan" -> "andy", "taylor" -> "andy",
    "casey" -> "andy", "morgan" -> "andy", "jamie" -> "andy",
    "alexis" -> "andy", "sam" -> "andy")

  /** The reference's collapse of dictionary categories (task.py:43-51). */
  def mapCategory(category: Column): Column =
    when(category === "mostly_male", "male")
      .when(category === "mostly_female", "female")
      .when(category === "andy", "unknown")
      .when(category.isNull, "unknown")
      .otherwise(category)

  /** The built-in dictionary as a (nm, category) frame. */
  def dictDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("nm", "category")
  }

  /** Enrich `df` with a gender column: broadcast-join `dict` on the
    * lowercased first word of `nameCol` (the reference capitalizes
    * before lookup, task.py:108 — case-folding subsumes that), then
    * apply the category mapping. Unmatched names → unknown.
    */
  def enrich(df: DataFrame, nameCol: Column, dict: DataFrame,
      out: String = "gender"): DataFrame = {
    // collision-proof internal names: a plain drop("nm"/"category")
    // would also delete same-named columns the CALLER owns
    val d = dict.select(dict("nm").as("__gd_nm"),
      dict("category").as("__gd_category"))
    df.join(broadcast(d),
        lower(TextFns.firstWord(nameCol)) === d("__gd_nm"), "left")
      .withColumn(out, mapCategory(d("__gd_category")))
      .drop("__gd_nm", "__gd_category")
  }
}
