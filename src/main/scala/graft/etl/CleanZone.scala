package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Clean-zone job: flatten the nested playback JSON into three relational
  * tables (reference: spark_jobs/playback_pipeline.py:91-225,278-310),
  * each parse implemented once as a pure DataFrame => DataFrame.
  *
  * Differences from the reference are mechanism-only (SURVEY §4.3): the two
  * Python UDFs are native Column expressions ([[Functions]]), no interleaved
  * show()/count() actions re-running the lineage, and each output is
  * computed once.
  */
object CleanZone {

  /** S1 — multiline nested JSON scan (reference:
    * spark_jobs/playback_pipeline.py:264). Schema inference preserved as the
    * reference behavior; pass an explicit schema for production hardening.
    */
  def readLanding(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  private def items(df: DataFrame): DataFrame =
    df.select(explode(col("items")).as("items")).select("items.*")

  /** albums — 9-column contract (reference: playback_pipeline.py:91-112). */
  def parseAlbums(df: DataFrame): DataFrame =
    items(df)
      .select("track.album")
      .select(
        col("album.album_type").as("album_type"),
        col("album.href").as("album_href"),
        col("album.id").as("album_id"),
        col("album.name").as("album_name"),
        col("album.release_date").as("album_release_date"),
        col("album.release_date_precision").as("album_release_date_precision"),
        col("album.total_tracks").as("total_tracks"),
        col("album.type").as("type"),
        col("album.uri").as("album_uri"))
      .withColumn("album_release_date", Functions.completeYear(col("album_release_date")))
      .dropDuplicates()

  /** artists — 5-column contract incl. the 2-level nested path
    * external_urls.spotify (reference: playback_pipeline.py:115-136). */
  def parseArtists(df: DataFrame): DataFrame =
    items(df)
      .select("track.artists")
      .select(explode(col("artists")).as("artists_exploded"))
      .select(
        col("artists_exploded.external_urls.spotify").as("artist_spotify_url"),
        col("artists_exploded.href").as("artist_href"),
        col("artists_exploded.id").as("artist_id"),
        col("artists_exploded.name").as("artist_name"),
        col("artists_exploded.uri").as("artist_uri"))
      .dropDuplicates()

  /** bagged artists — re-nest the exploded artists into a JSON-string array
    * per play, then regex the names/ids back out ", "-joined
    * (reference: playback_pipeline.py:161-193; the regex-over-JSON quirk is
    * preserved, natively — SURVEY §2.9 F9).
    */
  def bagArtists(df: DataFrame): DataFrame =
    items(df)
      .select(col("played_at"), col("track.id").as("id"),
        explode(col("track.artists")).as("artists_exploded"))
      .select(
        col("played_at"), col("id"),
        col("artists_exploded.name").as("artist_name"),
        col("artists_exploded.id").as("artist_id"),
        col("artists_exploded.uri").as("artist_uri"))
      .groupBy(col("played_at"), col("id"))
      .agg(to_json(collect_list(struct(
        col("artist_name"), col("artist_id"), col("artist_uri")))).as("bagged_artists"))
      .withColumn("artist_names", Functions.valuesFromKey(col("bagged_artists"), "artist_name"))
      .withColumn("artist_ids", Functions.valuesFromKey(col("bagged_artists"), "artist_id"))

  /** tracks — flatten track + album fields, derive durations, complete bare
    * years (reference: playback_pipeline.py:196-225). */
  def parseTracks(df: DataFrame): DataFrame =
    items(df)
      .select(
        col("played_at"),
        col("track.album").as("album"),
        col("track.artists").as("artists"),
        col("track.duration_ms").as("duration_ms"),
        col("track.href").as("track_href"),
        col("track.id").as("track_id"),
        col("track.name").as("track_name"),
        col("track.popularity").as("popularity"),
        col("track.type").as("type"),
        col("track.uri").as("track_uri"))
      .select(col("*"),
        col("album.id").as("album_id"),
        col("album.name").as("album_name"),
        col("album.release_date").as("album_release_date"),
        col("album.uri").as("album_uri"))
      .drop("album")
      .withColumn("duration_s", Functions.durationSeconds(col("duration_ms")))
      .withColumn("duration_min", Functions.durationMinutes(col("duration_ms")))
      .withColumn("album_release_date", Functions.completeYear(col("album_release_date")))
      .dropDuplicates()

  /** The 15-column playback_hist output contract, exact order
    * (reference: playback_pipeline.py:289-307; SURVEY §1.5). */
  val outputCols: Seq[String] = Seq(
    "played_at", "duration_ms", "duration_s", "duration_min",
    "track_href", "track_id", "track_name", "track_uri",
    "artist_names", "artist_ids", "popularity",
    "album_id", "album_name", "album_release_date", "album_uri")

  /** J1 — tracks LEFT JOIN bagged on the composite (played_at, track_id=id)
    * key, duplicate-name resolution via dataframe-qualified columns
    * (reference: playback_pipeline.py:278-307; trap SURVEY §7.4#3), then the
    * 15-column projection, dedup, global played_at sort.
    */
  def playbackHistory(tracks: DataFrame, bagged: DataFrame): DataFrame =
    tracks.join(bagged,
        tracks("played_at") === bagged("played_at") &&
          tracks("track_id") === bagged("id"), "left")
      .select(tracks("*") +: Seq(
        bagged("artist_names"), bagged("artist_ids"), bagged("bagged_artists")): _*)
      .select(outputCols.map(col): _*)
      .dropDuplicates()
      .orderBy("played_at")

  /** Full clean-zone job over one landing document: returns the three
    * output tables (playback_hist, albums, artists). */
  def run(spark: SparkSession, landingJsonPath: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val df = readLanding(spark, landingJsonPath)
    val playback = playbackHistory(parseTracks(df), bagArtists(df))
    (playback, parseAlbums(df), parseArtists(df))
  }
}
