"""Generate the 12 scene config JSONs (8 Replica + 4 ScanNet).

Schema-compatible with the reference configs (ref: configs/*/*.json), so
either framework can read either set. Values per SURVEY.md §6: Replica
scenes differ only in dataset/weight paths; ScanNet uses depth range 6 m,
obj_scale 3, bg_scale 10, latent 32, edge crop 10, intrinsics from file.
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "configs")

REPLICA_SCENES = ["room_0", "room_1", "room_2",
                  "office_0", "office_1", "office_2", "office_3", "office_4"]
SCANNET_SCENES = ["scene0013_02", "scene0059_00", "scene0066_00", "scene0281_00"]

COMMON = {
    "optimizer": {"args": {"lr": 0.001, "weight_decay": 0.013,
                           "code_lr": 0.001, "code_weight_decay": 0.013}},
    "trainer": {"n_models": 100, "train_device": "tpu", "data_device": "tpu",
                "scale": 1000.0, "max_iter": 10001, "log_iter": 100,
                "save_iter": 2000},
    "vis": {"grid_dim": 256, "live_voxel_size": 0.005, "mesh_it": 10000},
}


def replica_cfg(scene):
    cfg = json.loads(json.dumps(COMMON))
    cfg["dataset"] = {"path": f"Datasets/Replica/{scene}/sequences",
                      "format": "Replica"}
    cfg["render"] = {"depth_range": [0.0, 8.0], "n_bins": 9,
                     "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 5,
                     "n_per_optim": 120, "n_per_optim_bg": 1200}
    cfg["model"] = {"n_unidir_funcs": 5, "obj_scale": 2.0, "bg_scale": 5.0,
                    "color_scaling": 5.0, "opacity_scaling": 10.0,
                    "surface_eps": 0.1, "other_eps": 0.05,
                    "hidden_feature_size": 32, "hidden_feature_size_bg": 128,
                    "net_hyperparams": {"shape_blocks": 2, "texture_blocks": 1,
                                        "W": 32, "latent_dim": 256}}
    cfg["camera"] = {"w": 1200, "h": 680, "fx": 600.0, "fy": 600.0,
                     "cx": 599.5, "cy": 339.5, "mw": 0, "mh": 0}
    cfg["registration"] = {"load_registration_result": True,
                           "load_pretrained": True,
                           "weight_root": f"pretrained/Replica/{scene}",
                           "multi_init_pose": True,
                           "eta1": 0.06, "eta2": 0.15, "eta3": 0.12}
    return cfg


def scannet_cfg(scene):
    cfg = json.loads(json.dumps(COMMON))
    cfg["dataset"] = {"path": f"Datasets/ScanNet/{scene}/sequences",
                      "format": "ScanNet", "use_refined_mask": True,
                      "load_refined_mask": True}
    cfg["render"] = {"depth_range": [0.0, 6.0], "n_bins": 9,
                     "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 5,
                     "n_per_optim": 120, "n_per_optim_bg": 1200}
    cfg["model"] = {"n_unidir_funcs": 5, "obj_scale": 3.0, "bg_scale": 10.0,
                    "color_scaling": 5.0, "opacity_scaling": 10.0,
                    "surface_eps": 0.1, "other_eps": 0.05,
                    "hidden_layers_block": 1,
                    "hidden_feature_size": 32, "hidden_feature_size_bg": 128,
                    "net_hyperparams": {"shape_blocks": 2, "texture_blocks": 1,
                                        "W": 32, "latent_dim": 32}}
    cfg["camera"] = {"w": 640, "h": 480, "mw": 10, "mh": 10}
    cfg["registration"] = {"load_registration_result": True,
                           "load_pretrained": True,
                           "weight_root": f"pretrained/ScanNet/{scene}",
                           "multi_init_pose": True,
                           "eta1": 0.06, "eta2": 0.15, "eta3": 0.12}
    return cfg


def main():
    os.makedirs(os.path.join(OUT, "Replica"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "ScanNet"), exist_ok=True)
    for scene in REPLICA_SCENES:
        name = f"config_replica_{scene.replace('_', '')}.json"
        with open(os.path.join(OUT, "Replica", name), "w") as f:
            json.dump(replica_cfg(scene), f, indent=4)
    for scene in SCANNET_SCENES:
        num = scene.split("scene")[1].split("_")[0]
        name = f"config_scannet_{num}.json"
        with open(os.path.join(OUT, "ScanNet", name), "w") as f:
            json.dump(scannet_cfg(scene), f, indent=4)
    print("wrote", len(REPLICA_SCENES) + len(SCANNET_SCENES), "configs")


if __name__ == "__main__":
    main()
