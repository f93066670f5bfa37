package graft.sources

import java.nio.file.{Files, Path, Paths => JPaths}

/** Path resolution and project-root discovery.
  *
  * Capability parity with the reference's environment utilities
  * (reference: `src/hds_functions/environment_utils.py:35-127`), minus the
  * Databricks-runtime shims (`get_dbutils`, notebook-path discovery via
  * dbutils) which have no local equivalent and are documented out of scope
  * (SURVEY.md §2.4).
  */
object Paths {

  /** Resolve a path in three modes, mirroring `resolve_path`:
    *   - absolute paths pass through;
    *   - `./`-relative paths resolve against `projectFolder` (the reference
    *     reads `$PROJECT_FOLDER`; pass it explicitly or default from env);
    *   - otherwise the path resolves against `repoRoot` when given
    *     (the reference's pkg_resources repo mode).
    */
  def resolvePath(
      path: String,
      projectFolder: Option[String] = sys.env.get("PROJECT_FOLDER"),
      repoRoot: Option[String] = None
  ): String = {
    val p = JPaths.get(path)
    if (p.isAbsolute) path
    else if (path.startsWith("./")) {
      val base = projectFolder.getOrElse(
        throw new IllegalArgumentException(
          "Relative './' path requires a project folder (PROJECT_FOLDER env or explicit argument)"
        )
      )
      JPaths.get(base).resolve(path.stripPrefix("./")).toString
    } else {
      repoRoot
        .map(r => JPaths.get(r).resolve(path).toString)
        .getOrElse(path)
    }
  }

  /** Walk up from `start` until a directory containing `markerFile` is
    * found, mirroring `find_project_folder`'s marker search (the reference
    * uses a `.dbxproj` marker). Returns None when no ancestor has it. */
  def findProjectFolder(
      start: String,
      markerFile: String = ".dbxproj"
  ): Option[String] = {
    var dir: Path = JPaths.get(start).toAbsolutePath
    if (!Files.isDirectory(dir)) dir = dir.getParent
    while (dir != null) {
      if (Files.exists(dir.resolve(markerFile))) return Some(dir.toString)
      dir = dir.getParent
    }
    None
  }
}
