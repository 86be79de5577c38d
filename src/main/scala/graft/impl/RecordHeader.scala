package graft.impl

/** Maps logical expressions (slots) to physical DataFrame column names,
  * mirroring the reference's RecordHeader
  * (okapi-relational/.../impl/table/RecordHeader.scala:97-178): a node var
  * owns an id column, one Boolean column per label, and one column per
  * property; a rel var owns id/src/tgt/type and properties.
  */
sealed trait Slot { def owner: String }
case class IdSlot(owner: String) extends Slot
case class LabelSlot(owner: String, label: String) extends Slot
case class PropSlot(owner: String, key: String) extends Slot
case class SrcSlot(owner: String) extends Slot
case class TgtSlot(owner: String) extends Slot
case class TypeSlot(owner: String) extends Slot
/** Orientation marker for rels matched through an UNDIRECTED pattern:
  * false = bound as stored, true = bound reversed (the traversal-order
  * src/tgt columns are swapped relative to storage). startNode()/endNode()
  * and rel-struct rendering read through it so stored endpoints stay
  * truthful on reversed matches; absent (created rels, directed scans
  * before round 12) means false. */
case class RevSlot(owner: String) extends Slot
/** A plain value column (projected expression, UNWIND item, …). */
case class ValueSlot(owner: String) extends Slot
/** Var-length relationship: column holds an array of relationship ids. */
case class PathSlot(owner: String) extends Slot
/** Var-length relationship under a bound path variable: array of the
  * visited node ids in src->tgt order (both endpoints included). */
case class PathNodesSlot(owner: String) extends Slot

sealed trait VarKind
case class NodeKind(labels: Set[String]) extends VarKind
case class RelKind(types: Set[String]) extends VarKind
case class ListRelKind(types: Set[String]) extends VarKind
// A list of NODE ids (quantified-path-pattern inner node groups).
case class ListNodeKind(labels: Set[String]) extends VarKind
case object ValueKind extends VarKind

object RecordHeader {
  val empty: RecordHeader = RecordHeader(Map.empty, Map.empty)

  /** Deterministic, collision-free physical column name for a slot. */
  def colName(s: Slot): String = s match {
    case IdSlot(v) => esc(v) + "__id"
    case LabelSlot(v, l) => esc(v) + "__l_" + esc(l)
    case PropSlot(v, k) => esc(v) + "__p_" + esc(k)
    case SrcSlot(v) => esc(v) + "__src"
    case TgtSlot(v) => esc(v) + "__tgt"
    case TypeSlot(v) => esc(v) + "__type"
    case RevSlot(v) => esc(v) + "__rev"
    case ValueSlot(v) => esc(v) + "__v"
    case PathSlot(v) => esc(v) + "__path"
    case PathNodesSlot(v) => esc(v) + "__pathnodes"
  }

  private def esc(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c.toString else f"x${c.toInt}%02x").mkString
}

case class RecordHeader(slots: Map[Slot, String], kinds: Map[String, VarKind]) {
  def col(s: Slot): String = slots(s)
  def get(s: Slot): Option[String] = slots.get(s)
  def contains(s: Slot): Boolean = slots.contains(s)
  def vars: Set[String] = kinds.keySet
  def kindOf(v: String): Option[VarKind] = kinds.get(v)

  def ownedBy(v: String): Seq[Slot] = slots.keys.filter(_.owner == v).toSeq

  /** All physical columns owned by a var, id first (stable order). */
  def colsOf(v: String): Seq[String] = ownedBy(v).sortBy {
    case IdSlot(_) => "0"
    case SrcSlot(_) => "1"
    case TgtSlot(_) => "2"
    case TypeSlot(_) => "3"
    case RevSlot(_) => "3r"
    case LabelSlot(_, l) => "4" + l
    case PropSlot(_, k) => "5" + k
    case PathSlot(_) => "6"
    case ValueSlot(_) => "7"
  }.map(slots)

  def withSlot(s: Slot): RecordHeader =
    copy(slots = slots + (s -> RecordHeader.colName(s)))
  def withoutSlots(ss: Iterable[Slot]): RecordHeader =
    copy(slots = slots -- ss)
  def withSlots(ss: Iterable[Slot]): RecordHeader =
    copy(slots = slots ++ ss.map(s => s -> RecordHeader.colName(s)))
  def withVar(v: String, k: VarKind): RecordHeader = copy(kinds = kinds + (v -> k))
  def dropVar(v: String): RecordHeader =
    RecordHeader(slots.filterNot(_._1.owner == v), kinds - v)

  /** Keep only the given vars (projection). */
  def selectVars(vs: Set[String]): RecordHeader =
    RecordHeader(slots.filter { case (s, _) => vs(s.owner) }, kinds.view.filterKeys(vs).toMap)

  /** Rename a var, keeping all its slots (WITH n AS m). */
  def renameVar(from: String, to: String): (RecordHeader, Seq[(String, String)]) = {
    val renames = ownedBy(from).map { s =>
      val ns = s match {
        case IdSlot(_) => IdSlot(to)
        case LabelSlot(_, l) => LabelSlot(to, l)
        case PropSlot(_, k) => PropSlot(to, k)
        case SrcSlot(_) => SrcSlot(to)
        case TgtSlot(_) => TgtSlot(to)
        case TypeSlot(_) => TypeSlot(to)
        case RevSlot(_) => RevSlot(to)
        case ValueSlot(_) => ValueSlot(to)
        case PathSlot(_) => PathSlot(to)
      }
      (slots(s), RecordHeader.colName(ns), ns)
    }
    val nh = RecordHeader(
      slots.filterNot(_._1.owner == from) ++ renames.map(r => r._3 -> r._2),
      kinds - from + (to -> kinds(from)))
    (nh, renames.map(r => r._1 -> r._2))
  }

  def ++(other: RecordHeader): RecordHeader =
    RecordHeader(slots ++ other.slots, kinds ++ other.kinds)
}
