package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's four analytic queries (README.md:111–276) as DataFrame
  * chains over the five star-schema tables — the de-facto acceptance suite
  * of the reference (it publishes golden outputs for each).
  * SparkifyEtlSpec asserts the goldens over the checked-in fixture.
  *
  * Shapes covered: inner chained equi-join (J2), inner compound-key join on
  * the denormalized (user_id, level) pair (J3), GROUP BY COUNT(*) (A1),
  * null-skipping COUNT(col) (A2), global MAX + scalar-subquery filter
  * (A3/A4), multi-key ORDER BY + LIMIT → TakeOrderedAndProject (O1),
  * string concat / date-part assembly (F6/F7).
  */
object SparkifyQueries {

  /** Top-10 most-played songs (README.md:111–128). Song/artist dims are
    * broadcast: at 100 TB the fact table never shuffles for these joins.
    */
  def topSongs(songplays: DataFrame, songs: DataFrame, artists: DataFrame): DataFrame =
    songplays
      .join(broadcast(songs), songplays("song_id") === songs("song_id"))
      .join(broadcast(artists), songplays("artist_id") === artists("artist_id"))
      .groupBy(songs("title").as("song_title"), artists("name").as("artist_name"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("song_title"), col("artist_name"))
      .limit(10)

  /** Top-10 users by play count (README.md:153–169): compound-key join on
    * (user_id, level) — the denormalization the reference's model bakes in.
    */
  def topUsers(songplays: DataFrame, users: DataFrame): DataFrame =
    songplays
      .join(broadcast(users),
        songplays("user_id") === users("user_id") &&
          songplays("level") === users("level"))
      .select(
        concat(users("first_name"), lit(" "), users("last_name")).as("user_name"),
        users("user_id"))
      .groupBy(col("user_id"), col("user_name"))
      .agg(count(lit(1)).as("song_count"))
      .orderBy(col("song_count").desc, col("user_name"))
      .limit(10)

  /** The user id with the most plays (README.md:194–220): global MAX +
    * scalar-subquery filter, planned as a broadcast join against the 1-row
    * max — nothing collected to the driver.
    */
  def topUserId(songplays: DataFrame, users: DataFrame): DataFrame = {
    val counts = songplays
      .join(broadcast(users),
        songplays("user_id") === users("user_id") &&
          songplays("level") === users("level"))
      .groupBy(users("user_id"))
      .agg(count(songplays("session_id")).as("count"))
    val mx = counts.agg(max(col("count")).as("max_count"))
    counts.join(broadcast(mx), col("count") === col("max_count"))
      .select(col("user_id").as("top_user_id"))
  }

  /** Top-5 sessions for one user (README.md:233–261): per-user slice (P7),
    * two joins, COUNT(s_title) null-skipping, date string assembled from
    * DATE_PART pieces exactly like the reference (unpadded month/day).
    */
  def topSessionsForUser(
      songplays: DataFrame, users: DataFrame, songs: DataFrame, userId: String): DataFrame =
    songplays
      .where(songplays("user_id") === userId)
      .join(broadcast(users),
        songplays("user_id") === users("user_id") &&
          songplays("level") === users("level"))
      .join(broadcast(songs), songplays("song_id") === songs("song_id"))
      .select(
        concat(users("first_name"), lit(" "), users("last_name")).as("user_name"),
        songplays("session_id"),
        concat(
          year(songplays("start_time")), lit("-"),
          month(songplays("start_time")), lit("-"),
          dayofmonth(songplays("start_time"))).as("date"),
        songs("title"))
      .groupBy(col("session_id"), col("date"), col("user_name"))
      .agg(count(col("title")).as("song_count"))
      .orderBy(col("song_count").desc, col("date"))
      .limit(5)
}
