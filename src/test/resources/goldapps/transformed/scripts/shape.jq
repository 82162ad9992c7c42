{ "_id": ._id, "total": .a + .b }
