package graft

/** Shared content-key helpers for the jobs' resume/claim machinery.
  * One implementation so a future key-length or algorithm change (e.g.
  * widening past 12 hex chars after a collision) cannot silently leave
  * one job producing mismatched keys. */
private[graft] object Keys {
  /** 48-bit MD5 hex prefix of a canonical string — the stage-marker /
    * verdict-claim key shape ([[TrainingSetJob.runKey]],
    * [[EmbeddingCurationJob.cfgFingerprint]]). */
  def md5Hex12(canon: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
}
