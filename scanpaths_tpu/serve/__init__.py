from .export import build_serve_fn, export_bundle, load_bundle

__all__ = ["build_serve_fn", "export_bundle", "load_bundle"]
