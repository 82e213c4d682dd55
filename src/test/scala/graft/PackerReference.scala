package graft

/** Direct sequential replay of the reference packer's Receive semantics
  * (server/msgpacker/packer.go:57-90 + pack_checker.go MsgCountChecker):
  * append; flush if THIS message's size exceeds maxBytes (the count checker
  * never increments, but resets); else count++ and flush at maxCount; a
  * non-empty tail stays 'open' (the wall-clock timer would flush it).
  *
  * The single source of truth both the hand-built control vector
  * (CdcControlSpec) and the random-stream property (CdcPropertySpec)
  * compare [[graft.cdc.Cdc.msgpackBatchFrom]] against — one copy, so the
  * two tests can never pin contradictory semantics.
  */
object PackerReference {

  /** (n_msgs, bytes, firstId, lastId, reason) per batch, in order. */
  def fold(msgs: Seq[(Long, Long)], maxCount: Int,
      maxBytes: Long): Seq[(Long, Long, Long, Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, String)]
    var pack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var count = 0
    def flush(reason: String): Unit = {
      out += ((pack.size.toLong, pack.map(_._2).sum, pack.head._1, pack.last._1, reason))
      pack = scala.collection.mutable.ArrayBuffer.empty
      count = 0
    }
    msgs.sortBy(_._1).foreach { case (id, sz) =>
      pack += ((id, sz))
      if (sz > maxBytes) flush("size")
      else {
        count += 1
        if (count >= maxCount) flush("count")
      }
    }
    if (pack.nonEmpty) flush("open")
    out.toSeq
  }
}
