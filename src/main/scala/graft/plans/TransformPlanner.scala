package graft.plans

import graft.operators.{LabelTransform, Merge, Rename}

/** Non-interactive form of the reference's transform planner
  * (`jigsaw/model_utils/transforms.py:95-185`): validates an ordered
  * transform list against the current label vocabulary and tracks how the
  * vocabulary evolves — renames update the candidate list in place, merges
  * remove the originals and append the target (`:130-175`). The reference's
  * silent-no-op on a missing label (`mask.py:160-162`) is surfaced as a
  * planner error instead, since there is no interactive user to notice.
  */
object TransformPlanner {

  final case class Plan(transforms: Seq[LabelTransform],
      finalLabels: Seq[String])

  /** Validate and fold the transforms over `labels`, returning the plan and
    * final vocabulary. Throws IllegalArgumentException on a transform that
    * references an unknown label.
    */
  def plan(labels: Seq[String],
      transforms: Seq[LabelTransform]): Plan = {
    val finalLabels = transforms.zipWithIndex.foldLeft(labels.toVector) {
      case (vocab, (t, i)) =>
        t match {
          case Rename(orig, to) =>
            require(vocab.contains(orig),
              s"transform #$i: cannot rename unknown label '$orig' " +
                s"(vocabulary: ${vocab.mkString(", ")})")
            // rename onto an existing label = merge (mask.py:163-166)
            if (vocab.contains(to)) vocab.filterNot(_ == orig)
            else vocab.map(l => if (l == orig) to else l)
          case Merge(origs, to) =>
            val missing = origs.filterNot(vocab.contains)
            require(missing.isEmpty,
              s"transform #$i: cannot merge unknown label(s) " +
                s"${missing.mkString(", ")}")
            vocab.filterNot(origs.contains) :+ to
        }
    }
    Plan(transforms, finalLabels.distinct)
  }
}
