from tobac_flow_tpu.segment.label import flow_label, flow_link_overlap  # noqa: F401
