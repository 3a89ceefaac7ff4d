"""Data registry (reference: owl_wms/data/__init__.py:1-19), plus the
``cod_s3_audio`` id the reference names but whose module is missing
upstream (s3_cod_latent_audio; SURVEY.md §2.11) — here it maps to the
plain S3 loader until an audio-tar source exists — and synthetic sources
for offline benching/tests."""


def get_loader(data_id: str, batch_size: int, **kwargs):
    import jax
    kwargs.setdefault("process_index", jax.process_index())
    kwargs.setdefault("process_count", jax.process_count())

    if data_id == "cod":
        from .cod_latent import get_loader as fn
    elif data_id == "sequence_packing":
        from .latent_seq_packing import get_loader as fn
    elif data_id in ("cod_s3", "cod_s3_audio"):
        from .s3_cod_latent import get_loader as fn
        kwargs.pop("process_count", None)
    elif data_id == "cod_s3_mixed":
        from .s3_cod_latent_mixed import get_loader as fn
        kwargs.pop("process_count", None)
    elif data_id == "local_waveform":
        from .local_waveform import get_loader as fn
    elif data_id and data_id.startswith("synthetic"):
        from .synthetic import get_loader as _syn
        kwargs.pop("process_count", None)
        return _syn(data_id, batch_size, **kwargs)
    else:
        raise ValueError(f"Invalid data id: {data_id}")
    return fn(batch_size=batch_size, **kwargs)
