package graft.core

/** The fixed 25-node, 2-level ship-component ontology and the 5-entry
  * detection-label → visCode link dictionary, verbatim from the reference
  * (data/access/ship.py:21-155 and data/vismodel/Li*.py for the tree;
  * data/access/frame.py:37-43 for the dictionary — including the
  * `sea_chest_grating → 632.332` Box-Cooler quirk that must be
  * reproduced for triple parity).
  */
object Ontology {

  /** parentVisCode == null ⇒ attached directly to the Ship node. */
  val entries: Seq[OntologyEntry] = Seq(
    OntologyEntry("413", "Propeller Arrangement", null),
    OntologyEntry("413.2", "Propeller Blade Sealing Tightness", "413"),
    OntologyEntry("111", "Ship Hull Structure", null),
    OntologyEntry("631", "Sea Water System", null),
    OntologyEntry("631.1", "Openings", "631"),
    OntologyEntry("632", "Fresh Water System", null),
    OntologyEntry("632.332", "Box Cooler", "632"),
    OntologyEntry("460", "Motion and Trim Control Arrangement", null),
    OntologyEntry("464.1", "Stabilising Fins", "460"),
    OntologyEntry("465", "Bilge Keels", "460"),
    OntologyEntry("100", "Main Structure", null),
    OntologyEntry("102.1", "Coating, Marine Growth and Anti Fouling", "100"),
    OntologyEntry("102.2", "Anodes", "100"),
    OntologyEntry("421", "Rudder arrangement", null),
    OntologyEntry("421.2", "Rudder stock", "421"),
    OntologyEntry("421.3", "Rudder", "421"),
    OntologyEntry("421.4", "Sole piece/ pintles", "421"),
    OntologyEntry("421.5", "Flap/ becker rudder", "421"),
    OntologyEntry("412.72", "Propeller shaft arrangement", null),
    OntologyEntry("412.723", "Shaft seal tightness", "412.72"),
    OntologyEntry("412.725", "Shaft/ propeller key arrangement", "412.72"),
    OntologyEntry("433", "Propulsion thruster arrangement", null),
    OntologyEntry("433.2", "Hydraulic oil tightness", "433"),
    OntologyEntry("440", "Maneuvering thruster arrangement", null),
    OntologyEntry("173.1", "All other underwater appendages", null)
  )

  /** The 9 finding labels scored per frame (data/inspection/image_node.py:33). */
  val findingLabels: Seq[String] = Seq(
    "anode", "bilge_keel", "sea_chest_grating", "defect", "corrosion",
    "marine_growth", "over_board_valve", "paint_peel", "propeller"
  )

  /** 10th segmenter-only label, used for mosaics (LIACi_segmenter.py:111-120). */
  val mosaicLabel = "ship_hull"

  val allLabels: Seq[String] = findingLabels :+ mosaicLabel

  /** Detection label → visCode (data/access/frame.py:37-43, verbatim). */
  val linkDict: Map[String, String] = Map(
    "anode" -> "102.2",
    "over_board_valve" -> "631.1",
    "propeller" -> "413",
    "sea_chest_grating" -> "632.332",
    "bilge_keel" -> "465"
  )

  /** Classifier confidence threshold (image_node.py:36). */
  val classifierThreshold = 0.5

  /** Segmenter minimum-coverage threshold (image_node.py:41). */
  val segmentationThreshold = 0.01

  /** Deterministic per-ship Classification node id. The reference scopes
    * classification nodes per ship via the HAS* path from (Ship {imo})
    * (data/access/datastore.py:24-27); we realize the scope in the id.
    */
  def classNodeId(imo: String, visCode: String): String = s"c_${imo}_$visCode"
}
