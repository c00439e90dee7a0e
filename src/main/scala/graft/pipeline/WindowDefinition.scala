package graft.pipeline

/** Jet window vocabulary (reference: pipeline/WindowDefinition.java:98-143).
  * Durations are Spark interval strings ("10 minutes", "1 hour").
  */
sealed trait WindowDefinition
object WindowDefinition {
  /** tumbling(size) — WindowDefinition.java:98 */
  final case class Tumbling(size: String) extends WindowDefinition
  /** sliding(size, slideBy) — SlidingWindowDefinition.java:41 */
  final case class Sliding(size: String, slideBy: String) extends WindowDefinition
  /** session(timeout gap) — SessionWindowDefinition.java:32 */
  final case class Session(gap: String) extends WindowDefinition

  def tumbling(size: String): WindowDefinition = Tumbling(size)
  def sliding(size: String, slideBy: String): WindowDefinition = Sliding(size, slideBy)
  def session(gap: String): WindowDefinition = Session(gap)
}
