"""Building dataset from-disk mode + offline prep (create_data)."""
import pickle

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.data import building, create_data
from automatic_as_built_reconstruction_tpu.core import sample_ops


@pytest.fixture(scope="module")
def building_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("building_data")
    create_data.building_data_prep(root, num_scenes=3, num_val=2, seed=1)
    return root


class TestBuildingDataPrep:
    def test_layout(self, building_root):
        assert (building_root / "building_infos_train.pkl").exists()
        assert (building_root / "building_infos_val.pkl").exists()
        assert (building_root / "building_dbinfos_train.pkl").exists()
        scenes = list((building_root / "scenes").glob("*.npz"))
        assert len(scenes) == 5

    def test_dataset_from_disk(self, building_root):
        ds = building.BuildingDataset(
            root_path=building_root,
            info_path=building_root / "building_infos_val.pkl")
        assert len(ds) == 2
        sd = ds.get_sensor_data(0)
        assert sd["lidar"]["points"].shape[1] == 4
        assert len(sd["annotations"]["boxes"]) > 0
        # walls segmented
        walls = sd["annotations"]["boxes"][
            sd["annotations"]["names"] == "wall"]
        assert (walls[:, 4] <= 2.51).all()

    def test_gt_database_usable_by_sampler(self, building_root):
        with open(building_root / "building_dbinfos_train.pkl", "rb") as f:
            db = pickle.load(f)
        assert "wall" in db and len(db["wall"]) > 10
        sampler = sample_ops.DataBaseSampler(
            db, groups=[{"column": 4}], root_path=building_root,
            rng=np.random.default_rng(0))
        res = sampler.sample_all(np.zeros((0, 7), np.float32),
                                 np.array([], dtype="<U8"))
        assert res is not None
        assert len(res["gt_boxes"]) >= 1
        assert (res["gt_names"] == "column").all()
        assert len(res["points"]) > 0
