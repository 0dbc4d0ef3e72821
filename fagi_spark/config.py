"""Job configuration (the reference's FusionState analog).

FusionGISCLI parses ``key = value`` config lines into a FusionState
POJO and pre-flight-validates it (FusionState.java:148-211 setters;
checkConfiguration FusionState.java:59-137; template
fusion.conf.template:14-66). Here: a dataclass + the same style of
fail-early validation, consumed by the jobs/ entrypoints. Storage
credentials/endpoints collapse to table paths (no Virtuoso/PostGIS).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


KNOWN_ACTIONS = (
    "keep-left", "keep-right", "keep-both", "keep-most-points",
    "keep-most-points-translate", "shift-a-to-b", "shift-b-to-a",
    "concatenation", "avg-two-points", "shift-polygon-to-point",
    "shift-polygon-to-avg-distance", "scale", "offset-a", "offset-b")

KNOWN_METADATA_ACTIONS = (
    "none", "keep-left", "keep-right", "keep-both", "concat", "flatten")


@dataclass
class FusionConfig:
    """One fusion run. Mirrors fusion.conf.template keys:
    links_file -> links_path, pg/virt endpoints -> table paths,
    fuse_Transformation -> action, fuse_Threshold -> threshold_m,
    mfuse_Transformation -> metadata_action (+ scale/shift/rotation
    factors used by the shift family)."""

    links_path: str = ""
    geo_a_path: str = ""
    geo_b_path: str = ""
    out_path: str = ""
    action: str = "keep-most-points"
    metadata_action: str = "keep-both"
    dom_onto: str = "http://dom.org/"
    threshold_m: float = -1.0          # -1 = no distance gate (ShiftAToB.java:138-177)
    shift: float = 50.0                # percent, ShiftAToB s = shift/100
    scale: float = 1.0
    rotation_deg: float = 0.0
    radius_m: float = 3000.0
    link_threshold: float = 0.2        # batch (BatchFindLinkServlet.java:713)
    checkpoint_root: str = ""
    extra: dict = field(default_factory=dict)

    def validate(self) -> list[str]:
        """FusionState.checkConfiguration analog: returns problems
        (empty = valid) instead of printing; callers raise."""
        errs = []
        for key in ("links_path", "geo_a_path", "geo_b_path", "out_path"):
            if not getattr(self, key):
                errs.append(f"missing required path: {key}")
        if self.action not in KNOWN_ACTIONS:
            errs.append(f"unknown action {self.action!r} (known: {', '.join(KNOWN_ACTIONS)})")
        if self.metadata_action not in KNOWN_METADATA_ACTIONS:
            errs.append(f"unknown metadata action {self.metadata_action!r}")
        if not (0.0 <= self.link_threshold <= 1.0):
            errs.append("link_threshold must be in [0, 1]")
        if self.radius_m <= 0:
            errs.append("radius_m must be positive")
        if self.scale <= 0:
            errs.append("scale must be positive")
        return errs

    def require_valid(self) -> "FusionConfig":
        errs = self.validate()
        if errs:
            raise ValueError("invalid fusion config: " + "; ".join(errs))
        return self


def parse_conf(text: str) -> FusionConfig:
    """Parse ``key = value`` lines (fusion.conf shape; '#' comments,
    unknown keys land in .extra — FusionGISCLI.java:222-242).

    A '#' opens a comment only at line start or after whitespace, so
    URI values with fragments (``http://ex.org/onto#label`` — common in
    RDF configs) survive intact."""
    import re
    cfg = FusionConfig()
    names = {f.name for f in fields(cfg) if f.name != "extra"}
    for raw in text.splitlines():
        line = re.sub(r"(^|\s)#.*$", r"\1", raw).strip()
        if not line or "=" not in line:
            continue
        key, val = (p.strip() for p in line.split("=", 1))
        if key in names:
            cur = getattr(cfg, key)
            if isinstance(cur, float):
                setattr(cfg, key, float(val))
            else:
                setattr(cfg, key, val)
        else:
            cfg.extra[key] = val
    return cfg
