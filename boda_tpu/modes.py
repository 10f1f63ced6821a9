"""Mode registration hub: importing this module registers all CLI modes.

Mirrors the reference's link-time registration of ~60 NESI modes; modules
gated on optional features import lazily/fail-soft.
"""

# Registration happens at import. Keep this list in build-plan order.
_MODE_MODULES = [
    "boda_tpu.backend.modes",    # rtc_test
    "boda_tpu.backend.ipc",      # ipc_compute_worker, cs_test_master
    "boda_tpu.graph.modes",      # conv_ana, cnet_ana, net surgery
    "boda_tpu.apps.run_cnet",    # run_cnet, cnet_predict
    "boda_tpu.io.data_stream",   # scan_data_stream + stream stages
    "boda_tpu.apps.zmq_serve",   # zmq detection/classification service
    "boda_tpu.apps.stream_infer",  # cnet-infer net-in-the-loop stream stage
    "boda_tpu.apps.aio_serve",   # asyncio dynamic-batching inference service
    "boda_tpu.apps.eval_cls",    # test_lmdb accuracy eval + labeled sources
    "boda_tpu.io.disp",          # display_test/display_pil + viz stages
    "boda_tpu.io.video",         # video-src/video-sink stream stages
    "boda_tpu.io.pcap",          # pcap-src/pcap-sink stream stages
    "boda_tpu.io.velodyne",      # velodyne/velodyne-gen/velo-pcdm-to-xyz + test_velo_crc
    "boda_tpu.io.render",        # add-img-pts point-cloud renderer (os-render analog)
    "boda_tpu.io.rosbag",        # rosbag-src (bag v2.0 parser, no ROS dep)
    "boda_tpu.apps.cnet_bench",  # slope-timed whole-net throughput bench
    "boda_tpu.apps.train",       # cnet_train training driver
    "boda_tpu.parallel.multihost",  # mh_test jax.distributed self-check
    "boda_tpu.parallel.pp_modes",   # pp_test pipeline-parallel self-check
    "boda_tpu.tune.prof",        # ops_prof
    "boda_tpu.tune.plots",       # roofline_plot, wis_plot, op_eff_plot
    "boda_tpu.tune.wisdom_modes",  # wis_merge, wis_ana
    "boda_tpu.tune.opinfo",      # cnn_op_info
    "boda_tpu.tune.xprof",       # cnet_xprof per-kernel device-event profile
    "boda_tpu.apps.pyra",        # blf_pack/conv_pyra
    "boda_tpu.apps.score",       # PASCAL scoring
    "boda_tpu.testing.modes",    # test_cmds etc.
]

import importlib

for _m in _MODE_MODULES:
    try:
        importlib.import_module(_m)
    except ModuleNotFoundError as e:
        # allow partial builds during bring-up; missing own modules are not
        # silently ignored once present (typos in _MODE_MODULES still error)
        if not e.name.startswith("boda_tpu"):
            raise
