package graft.ingest

import java.nio.file.{Files, Paths}

/** Fixture-based stand-in for the reference's ingestion entry point
  * (main.py:10-54): instead of the Spotify REST API → GCS upload, write a
  * deterministic landing-zone JSON document locally (zero egress).
  *
  * The document shape is exactly the fields the Spark jobs read
  * (/root/repo/FIXTURES.md §A1), pretty-printed like the reference's
  * `json.dumps(indent=4, sort_keys=True)` (main.py:32-33). Data exercises:
  * a duplicate (played_at, track) pair → dedup A2; a multi-artist track →
  * explode + re-bag A1 + F9 ", " join; a bare-year release_date → F10.
  */
object Fixture {

  /** F12 — Basic-auth header construction (reference: spotify_api/auth.py:
    * 18-20 encodes `client_id:client_secret` base64 for the OAuth2 token
    * request). Pure function here; the network exchange itself is out of
    * scope (zero egress — the fixture below replaces the API entirely). */
  def basicAuthHeader(clientId: String, clientSecret: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes("UTF-8"))

  private def artist(id: String, name: String): String =
    s"""{
       |    "external_urls": {"spotify": "https://open.spotify.test/artist/$id"},
       |    "href": "https://api.spotify.test/v1/artists/$id",
       |    "id": "$id",
       |    "name": "$name",
       |    "uri": "spotify:artist:$id"
       |}""".stripMargin

  private def album(id: String, name: String, releaseDate: String,
      precision: String, totalTracks: Int, firstArtistId: String): String =
    s"""{
       |    "album_type": "album",
       |    "artists": [{"id": "$firstArtistId"}],
       |    "href": "https://api.spotify.test/v1/albums/$id",
       |    "id": "$id",
       |    "name": "$name",
       |    "release_date": "$releaseDate",
       |    "release_date_precision": "$precision",
       |    "total_tracks": $totalTracks,
       |    "type": "album",
       |    "uri": "spotify:album:$id"
       |}""".stripMargin

  private def item(playedAt: String, trackId: String, trackName: String,
      durationMs: Long, popularity: Int, albumJson: String,
      artistsJson: Seq[String]): String =
    s"""{
       |    "played_at": "$playedAt",
       |    "track": {
       |        "album": $albumJson,
       |        "artists": [${artistsJson.mkString(", ")}],
       |        "duration_ms": $durationMs,
       |        "href": "https://api.spotify.test/v1/tracks/$trackId",
       |        "id": "$trackId",
       |        "name": "$trackName",
       |        "popularity": $popularity,
       |        "type": "track",
       |        "uri": "spotify:track:$trackId"
       |    }
       |}""".stripMargin

  /** The canonical landing fixture document. */
  def playbackHistJson: String = {
    val a1 = artist("ar1", "Solo Artist")
    val a2 = artist("ar2", "Guest Artist")
    val a3 = artist("ar3", "Other Artist")
    val alBare = album("al1", "Bare Year Album", "1974", "year", 10, "ar1")
    val alFull = album("al2", "Modern Album", "2020-03-15", "day", 12, "ar3")
    val items = Seq(
      // multi-artist track on the bare-year album
      item("2024-01-05T17:23:45.123Z", "tr1", "Song One", 215000, 80, alBare, Seq(a1, a2)),
      // exact duplicate of the first play (dedup must collapse it)
      item("2024-01-05T17:23:45.123Z", "tr1", "Song One", 215000, 80, alBare, Seq(a1, a2)),
      // single-artist track on the day-precision album
      item("2024-01-05T18:00:00.000Z", "tr2", "Song Two", 180000, 55, alFull, Seq(a3)),
      // same track replayed later (distinct played_at)
      item("2024-01-05T19:10:05.500Z", "tr1", "Song One", 215000, 80, alBare, Seq(a1, a2)))
    s"""{
       |    "items": [${items.mkString(", ")}]
       |}""".stripMargin
  }

  /** Land the fixture document at `{landingDir}/playback_hist.json`
    * (mirrors main.py:32-49's write + upload, locally). Also lands the two
    * payloads no Spark job ever reads (main.py:27-28 — SURVEY dead-code
    * note) as empty placeholders, preserving the landing-zone layout.
    */
  def land(landingDir: String): String = {
    Files.createDirectories(Paths.get(landingDir))
    val main = Paths.get(landingDir, "playback_hist.json")
    Files.writeString(main, playbackHistJson)
    Files.writeString(Paths.get(landingDir, "track_features.json"), "{}")
    Files.writeString(Paths.get(landingDir, "track_genres.json"), "{}")
    main.toString
  }
}
