"""GitHub-zipball vendoring for job python dependencies (SURVEY §2 A26).

Reference parity (``/root/reference/etl_manager``):

* ``etl.py:343-369`` ``_get_github_resource_list`` — read
  ``github_zip_urls.txt`` from the job folder and (optionally) the shared
  resources folder, keeping lines longer than 10 chars.
* ``etl.py:457-476`` ``_download_github_zipfile_and_rezip_to_glue_file_structure``
  and ``utils.py:128-155`` ``_unnest_github_zipfile_and_return_new_zip_path``
  — a GitHub zipball (``https://github.com/<org>/<repo>/archive/<ref>.zip``)
  nests the package under a single ``<repo>-<ref>/`` top-level folder, so it
  is not importable from ``sys.path``/``--py-files`` directly. Vendoring =
  fetch, extract, un-nest that folder, re-zip with the package at the zip
  root, and name the artifact ``<repo>.zip`` (the reference takes
  ``url.split("/")[4]``).

Spark-first: the vendored zip is exactly what you hand to
``spark-submit --py-files`` / ``SparkContext.addPyFile`` on a real
cluster; the in-process :class:`~etl_manager_spark.jobs.runner.SparkJob`
puts it on ``sys.path`` for the job script.

Offline-testable: fetching goes through :func:`urllib.request.urlretrieve`,
so ``file://`` URLs exercise the full un-nest/re-zip pipeline with no
network. Hardening beyond the reference: zip-slip entries are rejected,
and a zipball whose root is not exactly one directory is an explicit
error instead of ``os.listdir(td)[0]`` roulette.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile
from typing import Callable
from urllib.parse import urlparse
from urllib.request import urlretrieve

from .runner import JobError

# Reference filter: `urls = [url for url in urls if len(url) > 10]`
# (etl.py:367) — blank lines and stray short tokens are dropped.
_MIN_URL_LEN = 10

# our convention first, then the reference's exact filename
# (example/glue_jobs/simple_etl_job/glue_py_resources/github_zip_urls.txt)
ZIPBALL_LIST_FILENAMES = ("zipball_urls.txt", "github_zip_urls.txt")
ZIPBALL_LIST_FILENAME = ZIPBALL_LIST_FILENAMES[0]

Fetcher = Callable[[str, str], None]


def _default_fetch(url: str, dest: str) -> None:
    urlretrieve(url, dest)  # noqa: S310 — scheme is the caller's contract


def read_zipball_urls(
    job_folder: str, shared_resources: str | None = None
) -> list[str]:
    """Collect zipball URLs from ``py_resources/zipball_urls.txt`` in the
    job folder and, when given, the shared resources folder (reference
    ``_get_github_resource_list``, etl.py:343-369 — same file-per-folder
    convention, same >10-char line filter, job-local lines first). The
    two accepted filenames are ALTERNATIVE spellings of the same list
    (the reference reads exactly one file per folder): only the first
    one present in a folder is read, so a folder carrying both does not
    produce duplicate URLs and a spurious duplicate-package JobError."""
    urls: list[str] = []
    for base in (job_folder, shared_resources):
        if not base:
            continue
        for fname in ZIPBALL_LIST_FILENAMES:
            path = os.path.join(base, "py_resources", fname)
            if not os.path.isfile(path):
                continue
            with open(path, encoding="utf-8") as fh:
                urls.extend(line.strip() for line in fh)
            break
    return [u for u in urls if len(u) > _MIN_URL_LEN]


def repo_name_from_url(url: str) -> str:
    """Derive the artifact name from a zipball URL.

    Reference behaviour is ``url.split("/")[4]`` (etl.py:467) — the
    ``<repo>`` segment of ``https://github.com/<org>/<repo>/archive/<ref>.zip``.
    We parse the path and take the segment before ``archive`` so the same
    rule holds for ``file://`` fixtures and codeload-style hosts, falling
    back to the reference's positional rule."""
    parts = [p for p in urlparse(url).path.split("/") if p]
    if "archive" in parts[1:]:
        # last occurrence: an ORG named "archive" must not shadow the
        # /<repo>/archive/<ref>.zip structural segment
        idx = len(parts) - 1 - parts[::-1].index("archive")
        return parts[idx - 1]
    split = url.split("/")
    if len(split) > 4 and split[4]:
        return split[4]
    raise JobError(f"cannot derive a package name from zipball url {url!r}")


def _safe_extract(zf: zipfile.ZipFile, dest: str) -> None:
    """Extract rejecting zip-slip: every member must resolve inside dest."""
    root = os.path.realpath(dest)
    for member in zf.namelist():
        target = os.path.realpath(os.path.join(dest, member))
        if target != root and not target.startswith(root + os.sep):
            raise JobError(
                f"zipball member {member!r} escapes the extraction root"
            )
    zf.extractall(dest)


def vendor_zipball(
    url: str, dest_dir: str, fetcher: Fetcher | None = None
) -> str:
    """Fetch one zipball, un-nest its single top-level folder, and re-zip
    it as ``<dest_dir>/<repo>.zip`` with the package at the zip root
    (reference etl.py:457-476 + utils.py:128-155). Returns the new path.

    ``fetcher(url, dest_path)`` defaults to urllib (``https://`` and
    ``file://`` both work); inject a stub to test failure paths."""
    fetch = fetcher or _default_fetch
    os.makedirs(dest_dir, exist_ok=True)
    name = repo_name_from_url(url)
    download = os.path.join(dest_dir, f"_{name}_zipball_download.zip")
    try:
        fetch(url, download)
    except JobError:
        raise
    except Exception as exc:  # noqa: BLE001 — surface as the job taxonomy
        raise JobError(f"failed to fetch zipball {url!r}: {exc}") from exc
    try:
        with tempfile.TemporaryDirectory() as td:
            try:
                with zipfile.ZipFile(download) as zf:
                    _safe_extract(zf, td)
            except zipfile.BadZipFile as exc:
                raise JobError(f"zipball {url!r} is not a zip file") from exc
            entries = os.listdir(td)
            if len(entries) != 1 or not os.path.isdir(
                os.path.join(td, entries[0])
            ):
                raise JobError(
                    f"zipball {url!r} must contain exactly one top-level "
                    f"folder (got {sorted(entries)!r}) — is it a GitHub "
                    "archive zipball?"
                )
            nested = os.path.join(td, entries[0])
            # make_archive appends .zip; collisions with an existing
            # artifact of the same repo name are the caller's dup check
            return shutil.make_archive(
                os.path.join(dest_dir, name), "zip", nested
            )
    finally:
        if os.path.exists(download):
            os.remove(download)


def vendor_all(
    urls: list[str], dest_dir: str, fetcher: Fetcher | None = None
) -> list[str]:
    """Vendor every URL, rejecting duplicate artifact names up front
    (reference ``_check_nondup_resources``, etl.py:332-341 — two zipballs
    of the same repo would silently shadow each other on sys.path)."""
    names = [repo_name_from_url(u) for u in urls]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise JobError(
            f"duplicate zipball package names {sorted(dupes)!r} — each repo "
            "may be vendored once per job"
        )
    return [vendor_zipball(u, dest_dir, fetcher) for u in urls]
